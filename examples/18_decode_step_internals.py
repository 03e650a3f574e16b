"""Round-4 decode-step internals: deferred KV append + fused glue.

Walks the three structural pieces of the serving decode step and
verifies each against its unfused formulation:

1. ``rope_quant_prep`` — ONE pallas launch doing rotary (q+k), bit-exact
   per-head int8 KV quantization and the head-grouped q packing that the
   attention kernel consumes directly (replaces ~10 small XLA fusions of
   glue per layer).
2. ``decode_attention(k_new=, v_new=, q_packed=, out_layout="flat")`` —
   the fresh token folds into the online softmax in-VMEM, so the cache
   write is off the critical path and the output lands in the
   wo-projection's [B, Hq*D] layout with zero transpose glue.
3. ``kv_cache_update`` replayed at step end — back-to-back slab-rewrite
   launches pipeline at ~2 us each (a single many-ref launch measured
   3.4 ms for 64 caches: docs/performance.md round-4).

CK analog: the fused pre-op/epilogue transfer stance
(thread_group_tensor_slice_transfer_v4r1_dequant.hpp, applied to the
serving runtime glue the reference leaves to its consumers).
"""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax
import numpy as np

from composable_kernel_tpu.ops.attention import decode_attention
from composable_kernel_tpu.ops.kv_update import kv_cache_update
from composable_kernel_tpu.ops.rope_prep import rope_quant_prep
from composable_kernel_tpu.utils.check_err import check_err

b, hq, hkv, d, s_max = (8, 32, 8, 128, 2048) if on_tpu else (2, 4, 2, 128, 256)
prefix = s_max // 2 + 1
group = hq // hkv
width = (hq + 2 * hkv) * d
ks = jax.random.split(jax.random.PRNGKey(0), 6)

# --- 1. rope_quant_prep vs the unfused jnp chain -------------------------
qkv = jax.random.normal(ks[0], (b, width), jnp.float32).astype(jnp.bfloat16)
positions = jnp.arange(b, dtype=jnp.int32) + prefix - b
inv = 1.0 / (500000.0 ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
ang = positions.astype(jnp.float32)[:, None] * inv
cos, sin = jnp.cos(ang), jnp.sin(ang)
rng = np.random.default_rng(0)
k_scale = jnp.asarray(rng.random((b, hkv)) * 0.02 + 0.01, jnp.float32)
v_scale = jnp.asarray(rng.random((b, hkv)) * 0.02 + 0.01, jnp.float32)

q_p, k_new, v_new = rope_quant_prep(
    qkv, cos, sin, n_heads=hq, n_kv_heads=hkv, head_dim=d,
    k_scale=k_scale, v_scale=v_scale,
)

# unfused reference chain
def rot(x):  # [B, H, 1, d] rotate-half
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    c, s = cos[:, None, None, :], sin[:, None, None, :]
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], -1).astype(x.dtype)

q_u = rot(qkv[:, : hq * d].reshape(b, 1, hq, d).transpose(0, 2, 1, 3))
k_u = rot(qkv[:, hq * d : (hq + hkv) * d].reshape(b, 1, hkv, d).transpose(0, 2, 1, 3))
v_u = qkv[:, (hq + hkv) * d :].reshape(b, 1, hkv, d).transpose(0, 2, 1, 3)
quant = lambda x, sc: jnp.clip(
    jnp.round(x.astype(jnp.float32) / sc[:, :, None, None]), -127, 127
).astype(jnp.int8)
np.testing.assert_array_equal(
    np.asarray(k_new[:, :, :d].reshape(b, hkv, 1, d)), np.asarray(quant(k_u, k_scale))
)
np.testing.assert_array_equal(
    np.asarray(v_new[:, :, :d].reshape(b, hkv, 1, d)), np.asarray(quant(v_u, v_scale))
)
rows_pad = -(-group // 8) * 8
q_ref = q_u.reshape(b, hkv, group, d)
got_q = np.asarray(q_p).reshape(b, hkv, rows_pad, -1)[:, :, :group, :d]
np.testing.assert_array_equal(got_q, np.asarray(q_ref))
print("rope_quant_prep: q pack + int8 K/V rows bit-exact vs unfused chain")

# --- 2. fold-in attention + flat output ----------------------------------
kc = jnp.asarray(rng.integers(-127, 128, (b, hkv, s_max, d)), jnp.int8)
vc = jnp.asarray(rng.integers(-127, 128, (b, hkv, s_max, d)), jnp.int8)
lens = jnp.full((b,), prefix, jnp.int32)

o_flat = decode_attention(
    None, kc, vc, kv_seq_len=lens, k_scale=k_scale, v_scale=v_scale,
    k_new=k_new[:, :, :d], v_new=v_new[:, :, :d],
    q_packed=(q_p, hq), out_layout="flat",
)

def write(c, new):
    return jax.vmap(
        lambda cb, nb, p: jax.lax.dynamic_update_slice(cb, nb, (0, p, 0))
    )(c, new, lens)

o_ref = decode_attention(
    q_u, write(kc, quant(k_u, k_scale)), write(vc, quant(v_u, v_scale)),
    kv_seq_len=lens + 1, k_scale=k_scale, v_scale=v_scale,
)
check_err(o_flat.reshape(b, hq, 1, d), o_ref, rtol=2e-2, atol=2e-2)
print("fold-in attention (flat layout) matches write-then-attend")

# --- 3. deferred cache write ---------------------------------------------
kc2, vc2 = kv_cache_update(
    kc, vc, k_new[:, :, :d].reshape(b, hkv, 1, d),
    v_new[:, :, :d].reshape(b, hkv, 1, d), lens,
)
np.testing.assert_array_equal(
    np.asarray(kc2), np.asarray(write(kc, quant(k_u, k_scale)))
)
print("deferred slab-rewrite append bit-exact vs scatter")

if on_tpu:
    fn = lambda q_, c_, s_: rope_quant_prep(
        q_, c_, s_, n_heads=hq, n_kv_heads=hkv, head_dim=d,
        k_scale=k_scale, v_scale=v_scale,
    )[0]
    time_and_report("rope_quant_prep (1 launch)", fn, qkv, cos, sin,
                    on_tpu=on_tpu)
    fn = lambda qp_: decode_attention(
        None, kc, vc, kv_seq_len=lens, k_scale=k_scale, v_scale=v_scale,
        k_new=k_new[:, :, :d], v_new=v_new[:, :, :d],
        q_packed=(qp_, hq), out_layout="flat",
    )
    time_and_report(
        "decode_attention fold-in flat", fn, q_p, on_tpu=on_tpu,
        bytes_accessed=float(2 * b * hkv * prefix * d),
    )
print("OK")
