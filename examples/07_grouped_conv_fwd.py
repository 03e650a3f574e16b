"""Grouped conv2d fwd + bias + relu (CK example/09 / client_example/07)."""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax

from composable_kernel_tpu.ops import epilogues as ep
from composable_kernel_tpu.ops.conv import conv_fwd
from composable_kernel_tpu.reference.conv import ref_conv_fwd
from composable_kernel_tpu.utils.check_err import check_err

n, h, w, c, k_out, groups = (8, 56, 56, 128, 256, 4) if on_tpu else (2, 8, 8, 16, 32, 4)
keys = jax.random.split(jax.random.PRNGKey(0), 3)
x = jax.random.normal(keys[0], (n, h, w, c), jnp.float32).astype(jnp.bfloat16)
wgt = jax.random.normal(keys[1], (3, 3, c // groups, k_out), jnp.float32).astype(jnp.bfloat16)
bias = jax.random.normal(keys[2], (k_out,), jnp.float32)

flops = 2.0 * n * h * w * k_out * 9 * (c // groups)
out = time_and_report(
    "grouped_conv2d_bias_relu",
    lambda x_, w_, b_: conv_fwd(
        x_, w_, padding=((1, 1), (1, 1)), groups=groups, ds=(b_,), c_op=ep.add_relu
    ),
    x, wgt, bias, flops=flops, on_tpu=on_tpu,
)
want = ref_conv_fwd(x, wgt, padding=(1, 1), groups=groups)
want = jnp.maximum(want.astype(jnp.float32) + bias, 0.0)
check_err(out, want, rtol=3e-2, atol=3e-2)
print("verification: OK")
