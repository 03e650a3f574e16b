"""Causal GQA flash attention fwd (CK example/32 + ck_tile 01_fmha analog)."""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax

from composable_kernel_tpu.ops.attention import flash_attention
from composable_kernel_tpu.reference.attention import ref_attention
from composable_kernel_tpu.utils.check_err import check_err

b, hq, hkv, s, d = (2, 32, 8, 2048, 128) if on_tpu else (1, 4, 2, 256, 64)
keys = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(keys[0], (b, hq, s, d), jnp.float32).astype(jnp.bfloat16)
k = jax.random.normal(keys[1], (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
v = jax.random.normal(keys[2], (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)

out = time_and_report(
    "flash_attention_causal_gqa",
    lambda q_, k_, v_: flash_attention(q_, k_, v_, causal=True),
    q, k, v,
    flops=2.0 * b * hq * s * s * d, on_tpu=on_tpu,  # causal ~half of 4*s^2*d
)
want = ref_attention(q, k, v, causal=True)
check_err(out, want, rtol=2e-2, atol=2e-2)
print("verification: OK")
