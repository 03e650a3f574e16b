"""Paged KV-cache attention tests (reference snapshot has none: beyond-
parity serving feature; SURVEY.md §2.5 notes no paged KV in-tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.ops.attention import (
    PagedKVCache,
    paged_flash_decode,
)
from composable_kernel_tpu.reference.attention import ref_attention
from composable_kernel_tpu.utils.check_err import check_err

KEYS = jax.random.split(jax.random.PRNGKey(11), 4)
TOL = dict(rtol=2e-2, atol=2e-2)


def _scatter(pool, table, seqs):
    """Place contiguous [Hkv, S, D] sequences into a [P, Hkv, page, D] pool."""
    page = pool.shape[2]
    for b, (pages, kv) in enumerate(zip(table, seqs)):
        s = kv.shape[1]
        for i, pg in enumerate(pages):
            lo = i * page
            if lo >= s:
                break
            chunk = kv[:, lo : lo + page]
            pool = pool.at[pg, :, : chunk.shape[1]].set(chunk)
    return pool


class TestPagedDecode:
    @pytest.mark.parametrize("lens", [[384, 256], [128, 500]])
    def test_matches_contiguous(self, lens):
        b, hq, hkv, d, page = 2, 4, 2, 64, 128
        max_len = 512
        q = jax.random.normal(KEYS[0], (b, hq, 1, d), jnp.float32).astype(jnp.bfloat16)
        ks = jax.random.normal(KEYS[1], (b, hkv, max_len, d), jnp.float32).astype(jnp.bfloat16)
        vs = jax.random.normal(KEYS[2], (b, hkv, max_len, d), jnp.float32).astype(jnp.bfloat16)

        # scatter into pools with a shuffled page assignment
        n_pages = 1 + b * (max_len // page)
        k_pool = jnp.zeros((n_pages, hkv, page, d), jnp.bfloat16)
        v_pool = jnp.zeros((n_pages, hkv, page, d), jnp.bfloat16)
        rng = np.random.default_rng(0)
        ids = rng.permutation(np.arange(1, n_pages))
        per = max_len // page
        table = np.stack([ids[i * per : (i + 1) * per] for i in range(b)])
        k_seqs = [ks[i] for i in range(b)]  # [Hkv, S, D]
        v_seqs = [vs[i] for i in range(b)]
        k_pool = _scatter(k_pool, table, k_seqs)
        v_pool = _scatter(v_pool, table, v_seqs)

        lens_a = jnp.asarray(lens, jnp.int32)
        got = paged_flash_decode(q, k_pool, v_pool, jnp.asarray(table), lens_a)
        want = ref_attention(q, ks, vs, kv_seq_len=lens_a)
        check_err(got, want, **TOL)

    def test_gqa_multi_query_rows(self):
        b, hq, hkv, d, page = 1, 8, 2, 128, 128
        q = jax.random.normal(KEYS[0], (b, hq, 4, d), jnp.float32).astype(jnp.bfloat16)
        ks = jax.random.normal(KEYS[1], (b, hkv, 256, d), jnp.float32).astype(jnp.bfloat16)
        vs = jax.random.normal(KEYS[2], (b, hkv, 256, d), jnp.float32).astype(jnp.bfloat16)
        n_pages = 3
        k_pool = jnp.zeros((n_pages, hkv, page, d), jnp.bfloat16)
        v_pool = jnp.zeros((n_pages, hkv, page, d), jnp.bfloat16)
        table = np.asarray([[2, 1]])
        k_pool = _scatter(k_pool, table, [ks[0]])
        v_pool = _scatter(v_pool, table, [vs[0]])
        lens = jnp.asarray([200], jnp.int32)
        got = paged_flash_decode(q, k_pool, v_pool, jnp.asarray(table), lens)
        want = ref_attention(q, ks, vs, kv_seq_len=lens)
        check_err(got, want, **TOL)


class TestPagedKVCache:
    def test_alloc_append_free(self):
        cache = PagedKVCache(n_pages=6, page=128, n_kv_heads=2, head_dim=64)
        cache.alloc(7)
        k1 = jax.random.normal(KEYS[0], (130, 2, 64), jnp.float32)
        cache.append(7, k1, k1 * 2.0)
        assert cache.lens[7] == 130
        assert len(cache.tables[7]) == 2  # 130 tokens -> 2 pages of 128
        table, lens = cache.batch_views([7])
        assert lens[0] == 130
        # pool content round-trips
        pg0 = int(table[0, 0])
        np.testing.assert_allclose(
            np.asarray(cache.k_pool[pg0].transpose(1, 0, 2), np.float32),
            np.asarray(k1[:128], np.float32), rtol=1e-2, atol=1e-2,
        )
        cache.free(7)
        assert 7 not in cache.tables
        assert len(cache._free) == 5

    def test_end_to_end_decode_matches_dense(self):
        b_page, hkv, hq, d = 128, 2, 4, 64
        cache = PagedKVCache(n_pages=8, page=b_page, n_kv_heads=hkv, head_dim=d)
        s = 200
        k = jax.random.normal(KEYS[1], (s, hkv, d), jnp.float32)
        v = jax.random.normal(KEYS[2], (s, hkv, d), jnp.float32)
        cache.alloc(0)
        cache.append(0, k, v)
        q = jax.random.normal(KEYS[3], (1, hq, 1, d), jnp.float32).astype(jnp.bfloat16)
        table, lens = cache.batch_views([0])
        got = paged_flash_decode(q, cache.k_pool, cache.v_pool, table, lens)
        want = ref_attention(
            q,
            k.transpose(1, 0, 2)[None].astype(jnp.bfloat16),
            v.transpose(1, 0, 2)[None].astype(jnp.bfloat16),
        )
        check_err(got, want, **TOL)
