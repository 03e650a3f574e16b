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


class TestDeferredAppend:
    """decode_attention(k_new=, v_new=): the fresh token folds into the
    online softmax in-VMEM instead of being written to the cache first
    (the deferred-append decode path; cache writes batch across layers
    back-to-back at step end)."""

    @pytest.mark.parametrize("lens", [[7, 200], [0, 511]])
    def test_matches_write_then_attend(self, lens):
        from composable_kernel_tpu.ops.attention import decode_attention

        b, hq, hkv, d, s_max = 2, 8, 2, 128, 512
        q = jax.random.normal(KEYS[0], (b, hq, 1, d), jnp.float32).astype(jnp.bfloat16)
        ks = jax.random.normal(KEYS[1], (b, hkv, s_max, d), jnp.float32).astype(jnp.bfloat16)
        vs = jax.random.normal(KEYS[2], (b, hkv, s_max, d), jnp.float32).astype(jnp.bfloat16)
        kn = jax.random.normal(KEYS[3], (b, hkv, 1, d), jnp.float32).astype(jnp.bfloat16)
        vn = jax.random.normal(KEYS[0], (b, hkv, 1, d), jnp.float32).astype(jnp.bfloat16)
        lens_a = jnp.asarray(lens, jnp.int32)

        got = decode_attention(q, ks, vs, kv_seq_len=lens_a, k_new=kn, v_new=vn)

        # baseline: write the row at positions[b], attend with lens+1
        def write(c, new):
            return jax.vmap(
                lambda cb, nb, p: jax.lax.dynamic_update_slice(cb, nb, (0, p, 0))
            )(c, new, lens_a)

        want = decode_attention(q, write(ks, kn), write(vs, vn),
                                kv_seq_len=lens_a + 1)
        check_err(got, want, **TOL)

    def test_int8_cache_and_window(self):
        from composable_kernel_tpu.ops.attention import decode_attention

        b, hq, hkv, d, s_max = 2, 4, 2, 128, 512
        q = jax.random.normal(KEYS[0], (b, hq, 1, d), jnp.float32).astype(jnp.bfloat16)
        rng = np.random.default_rng(0)
        ks = jnp.asarray(rng.integers(-127, 128, (b, hkv, s_max, d)), jnp.int8)
        vs = jnp.asarray(rng.integers(-127, 128, (b, hkv, s_max, d)), jnp.int8)
        kn = jnp.asarray(rng.integers(-127, 128, (b, hkv, 1, d)), jnp.int8)
        vn = jnp.asarray(rng.integers(-127, 128, (b, hkv, 1, d)), jnp.int8)
        k_sc = jnp.asarray(rng.random((b, hkv)) * 0.02 + 0.01, jnp.float32)
        v_sc = jnp.asarray(rng.random((b, hkv)) * 0.02 + 0.01, jnp.float32)
        lens_a = jnp.asarray([130, 490], jnp.int32)

        def write(c, new):
            return jax.vmap(
                lambda cb, nb, p: jax.lax.dynamic_update_slice(cb, nb, (0, p, 0))
            )(c, new, lens_a)

        for window in (None, 64):
            got = decode_attention(q, ks, vs, kv_seq_len=lens_a,
                                   k_scale=k_sc, v_scale=v_sc,
                                   k_new=kn, v_new=vn, window=window)
            want = decode_attention(q, write(ks, kn), write(vs, vn),
                                    kv_seq_len=lens_a + 1,
                                    k_scale=k_sc, v_scale=v_sc, window=window)
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


def _ref_causal_chunk(q, ks, vs, lens, sq, window=None):
    """Inline reference: query i sits at lens-sq+i and attends keys <= it
    (and > it - window when windowed)."""
    import math

    b, hq, _, d = q.shape
    hkv = ks.shape[1]
    rep = hq // hkv
    kf = jnp.repeat(ks.astype(jnp.float32), rep, axis=1)
    vf = jnp.repeat(vs.astype(jnp.float32), rep, axis=1)
    att = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kf) / math.sqrt(d)
    kpos = jnp.arange(kf.shape[2])[None, None, None, :]
    qpos = (jnp.asarray(lens)[:, None, None, None] - sq
            + jnp.arange(sq)[None, None, :, None])
    mask = kpos <= qpos
    if window is not None:
        mask &= kpos > qpos - window
    att = jnp.where(mask, att, -1e30)
    p = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vf).astype(q.dtype)


class TestPagedCausalChunk:
    """In-chunk causality over page pools: the speculative verify step."""

    def _pools(self, b, hkv, d, page, max_len, kq, kk, kv):
        q_sq = 4
        q = jax.random.normal(kq, (b, 4, q_sq, d), jnp.float32).astype(jnp.bfloat16)
        ks = jax.random.normal(kk, (b, hkv, max_len, d), jnp.float32).astype(jnp.bfloat16)
        vs = jax.random.normal(kv, (b, hkv, max_len, d), jnp.float32).astype(jnp.bfloat16)
        n_pages = 1 + b * (max_len // page)
        k_pool = jnp.zeros((n_pages, hkv, page, d), jnp.bfloat16)
        v_pool = jnp.zeros((n_pages, hkv, page, d), jnp.bfloat16)
        rng = np.random.default_rng(3)
        ids = rng.permutation(np.arange(1, n_pages))
        per = max_len // page
        table = np.stack([ids[i * per : (i + 1) * per] for i in range(b)])
        k_pool = _scatter(k_pool, table, [ks[i] for i in range(b)])
        v_pool = _scatter(v_pool, table, [vs[i] for i in range(b)])
        return q, ks, vs, k_pool, v_pool, jnp.asarray(table)

    def test_causal_chunk_matches_reference(self):
        b, hkv, d, page = 2, 2, 64, 128
        q, ks, vs, k_pool, v_pool, table = self._pools(
            b, hkv, d, page, 384, KEYS[0], KEYS[1], KEYS[2]
        )
        lens = jnp.asarray([300, 135], jnp.int32)
        got = paged_flash_decode(q, k_pool, v_pool, table, lens, causal=True)
        want = _ref_causal_chunk(q, ks, vs, lens, sq=4)
        check_err(got, want, **TOL)

    def test_causal_chunk_windowed(self):
        b, hkv, d, page = 2, 2, 64, 128
        q, ks, vs, k_pool, v_pool, table = self._pools(
            b, hkv, d, page, 384, KEYS[1], KEYS[2], KEYS[3]
        )
        lens = jnp.asarray([380, 200], jnp.int32)
        got = paged_flash_decode(
            q, k_pool, v_pool, table, lens, causal=True, window=96
        )
        want = _ref_causal_chunk(q, ks, vs, lens, sq=4, window=96)
        check_err(got, want, **TOL)

    def test_sq1_unchanged(self):
        # causal with a single query degrades to the plain decode mask
        b, hkv, d, page = 1, 2, 64, 128
        q, ks, vs, k_pool, v_pool, table = self._pools(
            b, hkv, d, page, 256, KEYS[2], KEYS[3], KEYS[0]
        )
        q1 = q[:, :, :1]
        lens = jnp.asarray([180], jnp.int32)
        got = paged_flash_decode(q1, k_pool, v_pool, table, lens, causal=True)
        want = paged_flash_decode(q1, k_pool, v_pool, table, lens)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestPagedChunkStep:
    """llama.paged_prefill_chunk_step == contiguous prefill_chunk_step."""

    def test_matches_contiguous_chunk_step(self):
        from composable_kernel_tpu.models import llama

        cfg = llama.tiny_config(quant="bf16", n_layers=2, dtype="float32")
        params = llama.init_weights(cfg, jax.random.PRNGKey(5))
        toks = jax.random.randint(jax.random.PRNGKey(6), (2, 24), 0,
                                  cfg.vocab_size)
        page = 128
        prompt = toks[:, :16]

        # contiguous: full prefill then a per-slot-offset chunk step
        _, seeds = llama.forward(params, prompt, cfg, return_cache=True)
        cache = llama.seed_kv_cache(llama.init_kv_cache(cfg, 2), seeds, cfg)
        chunk = toks[:, 16:20]
        pos = jnp.asarray([16, 16], jnp.int32)
        want, _ = llama.prefill_chunk_step(params, cache, chunk, pos, cfg)

        # paged: seed each slot's pages, then the paged chunk step
        per = -(-cfg.max_seq_len // page)
        pools = llama.init_paged_cache(cfg, 1 + 2 * per, page, batch_slots=2)
        table = np.zeros((2, per), np.int32)
        nxt = 1
        for slot in range(2):
            pages = list(range(nxt, nxt + per))
            nxt += per
            table[slot, :] = pages
            sl = [(k[slot : slot + 1], v[slot : slot + 1]) for k, v in seeds]
            pools = llama.seed_paged_cache(pools, sl, table, cfg, page=page,
                                           slot_pages=pages, slot=slot)
        got, _ = llama.paged_prefill_chunk_step(
            params, pools, jnp.asarray(table), chunk, pos, cfg, page=page
        )
        check_err(got, want, rtol=2e-2, atol=2e-2)


class TestDenseCausalChunk:
    """decode_attention(causal=True): the contiguous-cache verify path."""

    def test_matches_reference(self):
        from composable_kernel_tpu.ops.attention import decode_attention

        b, hq, hkv, d, sq = 2, 8, 2, 64, 4
        q = jax.random.normal(KEYS[0], (b, hq, sq, d), jnp.float32).astype(jnp.bfloat16)
        ks = jax.random.normal(KEYS[1], (b, hkv, 384, d), jnp.float32).astype(jnp.bfloat16)
        vs = jax.random.normal(KEYS[2], (b, hkv, 384, d), jnp.float32).astype(jnp.bfloat16)
        lens = jnp.asarray([300, 135], jnp.int32)
        got = decode_attention(q, ks, vs, kv_seq_len=lens, causal=True)
        want = _ref_causal_chunk(q, ks, vs, lens, sq=4)
        check_err(got, want, **TOL)

    def test_windowed_causal(self):
        from composable_kernel_tpu.ops.attention import decode_attention

        b, hq, hkv, d, sq = 1, 4, 2, 64, 4
        q = jax.random.normal(KEYS[3], (b, hq, sq, d), jnp.float32).astype(jnp.bfloat16)
        ks = jax.random.normal(KEYS[0], (b, hkv, 256, d), jnp.float32).astype(jnp.bfloat16)
        vs = jax.random.normal(KEYS[1], (b, hkv, 256, d), jnp.float32).astype(jnp.bfloat16)
        lens = jnp.asarray([240], jnp.int32)
        got = decode_attention(q, ks, vs, kv_seq_len=lens, causal=True,
                               window=96)
        want = _ref_causal_chunk(q, ks, vs, lens, sq=4, window=96)
        check_err(got, want, **TOL)


class TestPagedDecodeStepModel:
    """Model-level paged_decode_step: kernel path vs reference path, with
    path-fired evidence (VERDICT r4 #7 — a parity test must prove the fast
    path it claims to test actually executed)."""

    @pytest.mark.parametrize("fuse", [True, False])
    def test_kernel_path_matches_reference_and_fires(self, fuse):
        from composable_kernel_tpu.models import llama

        cfg = llama.tiny_config(quant="w4a8", dtype="float32",
                                fuse_qkv=fuse)
        qp = llama.quantize_weights(
            llama.init_weights(cfg, jax.random.PRNGKey(5)), cfg
        )
        page = 128  # paged kernel requires lane-multiple pages
        per = cfg.max_seq_len // page
        n_pages = 1 + per
        prompt_len = 16
        toks = jax.random.randint(
            jax.random.PRNGKey(1), (1, prompt_len), 0, cfg.vocab_size
        )
        _, seeds = llama.forward(qp, toks, cfg, return_cache=True,
                                 kernels=False)
        pages = list(range(1, per + 1))
        table = np.zeros((1, per), np.int32)
        table[0] = pages
        pools = llama.init_paged_cache(cfg, n_pages, page, batch_slots=1)
        pools = llama.seed_paged_cache(pools, seeds, jnp.asarray(table), cfg,
                                       page=page, slot_pages=pages, slot=0)
        pos = jnp.asarray([prompt_len], jnp.int32)
        nxt = toks[:, :1]
        fired_key = "paged_rope_prep_fused" if fuse else "paged_deferred_append"
        before = llama.path_counters[fired_key]
        got, _ = llama.paged_decode_step(qp, pools, jnp.asarray(table), nxt,
                                         pos, cfg, page=page, kernels=True)
        assert (llama.path_counters[fired_key]
                >= before + cfg.n_layers), dict(llama.path_counters)
        want, _ = llama.paged_decode_step(qp, pools, jnp.asarray(table), nxt,
                                          pos, cfg, page=page, kernels=False)
        g = np.asarray(got, np.float32)
        w = np.asarray(want, np.float32)
        rel = np.linalg.norm(g - w) / np.linalg.norm(w)
        assert rel < 0.05, rel
