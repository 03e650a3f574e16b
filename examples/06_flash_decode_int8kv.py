"""Long-KV decode with int8 KV cache (flash-decoding + per-head dequant).

CK analog: ck_tile fmha_fwd_splitkv (flash-decoding) composed with the
fpAintB dequant technique applied to the KV cache.
"""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax

from composable_kernel_tpu.ops.attention import flash_decode
from composable_kernel_tpu.reference.attention import ref_attention
from composable_kernel_tpu.utils.check_err import check_err

b, hq, hkv, sk, d = (4, 32, 8, 8192, 128) if on_tpu else (1, 8, 2, 1024, 64)
keys = jax.random.split(jax.random.PRNGKey(0), 3)
q = jax.random.normal(keys[0], (b, hq, 1, d), jnp.float32).astype(jnp.bfloat16)
k = jax.random.normal(keys[1], (b, hkv, sk, d), jnp.float32).astype(jnp.bfloat16)
v = jax.random.normal(keys[2], (b, hkv, sk, d), jnp.float32).astype(jnp.bfloat16)

# per-head symmetric int8 KV quantization
def q8(x):
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3))
    s = jnp.maximum(absmax / 127.0, 1e-8)
    return (
        jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, :, None, None]), -127, 127
                 ).astype(jnp.int8),
        s,
    )

kq, ks = q8(k)
vq, vs = q8(v)
lens = jnp.full((b,), sk, jnp.int32)
kv_bytes = kq.size + vq.size

out = time_and_report(
    "flash_decode_int8kv",
    lambda q_, k_, v_: flash_decode(q_, k_, v_, kv_seq_len=lens,
                                    k_scale=ks, v_scale=vs),
    q, kq, vq,
    bytes_accessed=float(kv_bytes), on_tpu=on_tpu,
)
k_dq = (kq.astype(jnp.float32) * ks[:, :, None, None]).astype(jnp.bfloat16)
v_dq = (vq.astype(jnp.float32) * vs[:, :, None, None]).astype(jnp.bfloat16)
want = ref_attention(q, k_dq, v_dq)
check_err(out, want, rtol=3e-2, atol=3e-2)
print("verification: OK")
