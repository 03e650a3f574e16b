"""Fused add+layernorm and alpha/beta softmax Pallas kernels
(CK example/27_layernorm + device_softmax analog)."""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax

from composable_kernel_tpu.ops.normalization import layernorm, softmax
from composable_kernel_tpu.reference.normalization import ref_layernorm, ref_softmax
from composable_kernel_tpu.utils.check_err import check_err

rows, n = (4096, 4096) if on_tpu else (128, 512)
keys = jax.random.split(jax.random.PRNGKey(0), 4)
x = jax.random.normal(keys[0], (rows, n), jnp.float32)
res = jax.random.normal(keys[1], (rows, n), jnp.float32)
g = jax.random.normal(keys[2], (n,), jnp.float32)
b = jax.random.normal(keys[3], (n,), jnp.float32)

out = time_and_report(
    "add_layernorm",
    lambda x_, r_, g_, b_: layernorm(x_, g_, b_, pre_add=r_),
    x, res, g, b,
    bytes_accessed=3.0 * x.size * 4, on_tpu=on_tpu,
)
want, _, _ = ref_layernorm(x, g, b, pre_add=res)
check_err(out, want, rtol=1e-4, atol=1e-4)

out = time_and_report(
    "softmax", lambda x_: softmax(x_, alpha=2.0), x,
    bytes_accessed=2.0 * x.size * 4, on_tpu=on_tpu,
)
check_err(out, ref_softmax(x, alpha=2.0), rtol=1e-4, atol=1e-5)
print("verification: OK")
