"""ResNet bottleneck block on the conv family (the conv-sweep workload CK
tracks with script/profile_resnet50.sh): conv1x1 -> bn -> relu ->
conv3x3(grouped) -> bn -> relu -> conv1x1 -> bn -> +residual -> relu."""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax

from composable_kernel_tpu.ops import epilogues as ep
from composable_kernel_tpu.ops.conv import conv_fwd
from composable_kernel_tpu.ops.normalization import batchnorm_infer

n, hw, c_in, c_mid = (8, 56, 256, 64) if on_tpu else (2, 14, 32, 16)
keys = jax.random.split(jax.random.PRNGKey(0), 9)
x = jax.random.normal(keys[0], (n, hw, hw, c_in), jnp.float32).astype(jnp.bfloat16)
w1 = jax.random.normal(keys[1], (1, 1, c_in, c_mid), jnp.float32).astype(jnp.bfloat16) * 0.05
w2 = jax.random.normal(keys[2], (3, 3, c_mid, c_mid), jnp.float32).astype(jnp.bfloat16) * 0.05
w3 = jax.random.normal(keys[3], (1, 1, c_mid, c_in), jnp.float32).astype(jnp.bfloat16) * 0.05


def bn_params(i, c):
    return (
        jnp.abs(jax.random.normal(keys[i], (c,), jnp.float32)) + 0.5,
        jax.random.normal(keys[i + 1], (c,), jnp.float32) * 0.1,
        jnp.zeros((c,), jnp.float32),
        jnp.ones((c,), jnp.float32),
    )


bn1, bn2, bn3 = bn_params(4, c_mid), bn_params(4, c_mid), bn_params(6, c_in)


def block(x):
    h = conv_fwd(x, w1, c_op=ep.relu)
    h = batchnorm_infer(h, *bn1)
    h = conv_fwd(h, w2, padding=((1, 1), (1, 1)), c_op=ep.relu)
    h = batchnorm_infer(h, *bn2)
    h = conv_fwd(h, w3)
    h = batchnorm_infer(h, *bn3)
    return jnp.maximum(h.astype(jnp.float32) + x.astype(jnp.float32), 0.0).astype(x.dtype)


flops = 2.0 * n * hw * hw * (c_in * c_mid + 9 * c_mid * c_mid + c_mid * c_in)
out = time_and_report("resnet_bottleneck", jax.jit(block), x, flops=flops, on_tpu=on_tpu)
assert out.shape == x.shape and bool(jnp.isfinite(out.astype(jnp.float32)).all())
print("verification: OK")
