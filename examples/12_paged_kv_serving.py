"""Paged (block-table) KV cache: allocator + single-stream decode kernel.

The reference snapshot has no paged KV (SURVEY.md §2.5); this demos the
TPU-native design — a global page pool, per-sequence block tables in
scalar-prefetch SMEM, and a (batch, page) grid where every page is DMA'd
exactly once for all query heads.
"""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax
import numpy as np

from composable_kernel_tpu.ops.attention import PagedKVCache, paged_flash_decode
from composable_kernel_tpu.reference.attention import ref_attention
from composable_kernel_tpu.utils.check_err import check_err

hkv, hq, d, page = (8, 32, 128, 128) if on_tpu else (2, 4, 64, 128)
lens = [1500, 700, 260] if on_tpu else [200, 150, 130]
cache = PagedKVCache(n_pages=64, page=page, n_kv_heads=hkv, head_dim=d)

keys = jax.random.split(jax.random.PRNGKey(0), 2 * len(lens) + 1)
kv_full = []
for i, s in enumerate(lens):
    k = jax.random.normal(keys[2 * i], (s, hkv, d), jnp.float32)
    v = jax.random.normal(keys[2 * i + 1], (s, hkv, d), jnp.float32)
    cache.alloc(i)
    cache.append(i, k, v)
    kv_full.append((k, v))

q = jax.random.normal(keys[-1], (len(lens), hq, 1, d), jnp.float32).astype(jnp.bfloat16)
table, seq_lens = cache.batch_views(range(len(lens)))

fn = jax.jit(lambda q_, kp, vp: paged_flash_decode(q_, kp, vp, table, seq_lens))
live_bytes = 2.0 * sum(lens) * hkv * d * 2
out = time_and_report("paged_flash_decode", fn, q, cache.k_pool, cache.v_pool,
                      bytes_accessed=live_bytes, on_tpu=on_tpu)

# verify against dense attention over the reconstructed caches
s_max = max(lens)
kd = jnp.stack([jnp.pad(k, ((0, s_max - k.shape[0]), (0, 0), (0, 0)))
                for k, _ in kv_full]).transpose(0, 2, 1, 3).astype(jnp.bfloat16)
vd = jnp.stack([jnp.pad(v, ((0, s_max - v.shape[0]), (0, 0), (0, 0)))
                for _, v in kv_full]).transpose(0, 2, 1, 3).astype(jnp.bfloat16)
want = ref_attention(q, kd, vd, kv_seq_len=seq_lens)
check_err(out, want, rtol=2e-2, atol=2e-2)
cache.free(1)  # pages return to the free list for the next admission
print("verification: OK")
