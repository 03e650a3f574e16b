"""S3 tests: flash attention fwd, masks, GQA, varlen, split-KV, int8 KV.

Reference-comparison strategy per SURVEY.md §4; masking parity with CK
MaskingSpecialization + ck_tile block_masking; split-KV combine parity with
fmha_fwd_splitkv_combine_kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.ops.attention import (
    AttentionConfig,
    flash_attention,
    flash_decode,
)
from composable_kernel_tpu.reference.attention import ref_attention
from composable_kernel_tpu.utils.check_err import check_err

KEYS = jax.random.split(jax.random.PRNGKey(7), 8)


def _qkv(b, hq, hkv, sq, sk, d, dtype=jnp.bfloat16):
    q = jax.random.normal(KEYS[0], (b, hq, sq, d), jnp.float32).astype(dtype)
    k = jax.random.normal(KEYS[1], (b, hkv, sk, d), jnp.float32).astype(dtype)
    v = jax.random.normal(KEYS[2], (b, hkv, sk, d), jnp.float32).astype(dtype)
    return q, k, v


# attention outputs accumulate across long softmax reductions; bf16 CK
# tolerance (1e-3 rel) with a small atol floor for near-zero outputs
TOL = dict(rtol=2e-2, atol=2e-2)


class TestFlashAttention:
    @pytest.mark.parametrize("sq,sk", [(128, 128), (256, 512), (100, 257)])
    def test_plain(self, sq, sk):
        q, k, v = _qkv(2, 4, 4, sq, sk, 64)
        got = flash_attention(q, k, v)
        want = ref_attention(q, k, v)
        check_err(got, want, **TOL)

    def test_causal(self):
        q, k, v = _qkv(1, 2, 2, 256, 256, 64)
        got = flash_attention(q, k, v, causal=True)
        want = ref_attention(q, k, v, causal=True)
        check_err(got, want, **TOL)

    def test_causal_decode_alignment(self):
        # bottom-right alignment: Sq < Sk (decode with prior KV)
        q, k, v = _qkv(1, 2, 2, 16, 512, 64)
        got = flash_attention(q, k, v, causal=True)
        want = ref_attention(q, k, v, causal=True)
        check_err(got, want, **TOL)

    def test_sliding_window(self):
        q, k, v = _qkv(1, 2, 2, 256, 256, 64)
        got = flash_attention(q, k, v, causal=True, window=64)
        want = ref_attention(q, k, v, causal=True, window=64)
        check_err(got, want, **TOL)

    def test_gqa(self):
        q, k, v = _qkv(2, 8, 2, 128, 256, 64)
        got = flash_attention(q, k, v, causal=True)
        want = ref_attention(q, k, v, causal=True)
        check_err(got, want, **TOL)

    def test_mqa(self):
        q, k, v = _qkv(1, 8, 1, 128, 128, 64)
        got = flash_attention(q, k, v)
        want = ref_attention(q, k, v)
        check_err(got, want, **TOL)

    def test_bias(self):
        b, h, sq, sk, d = 1, 2, 128, 128, 64
        q, k, v = _qkv(b, h, h, sq, sk, d)
        bias = jax.random.normal(KEYS[3], (b, h, sq, sk), jnp.float32)
        got = flash_attention(q, k, v, bias=bias)
        want = ref_attention(q, k, v, bias=bias)
        check_err(got, want, **TOL)

    def test_varlen(self):
        # ragged batch via kv_seq_len (ck_tile group-mode analog)
        q, k, v = _qkv(3, 2, 2, 64, 512, 64)
        lens = jnp.asarray([512, 200, 37], jnp.int32)
        got = flash_attention(q, k, v, kv_seq_len=lens)
        want = ref_attention(q, k, v, kv_seq_len=lens)
        check_err(got, want, **TOL)

    def test_head_dim_not_128(self):
        q, k, v = _qkv(1, 2, 2, 128, 128, 80)
        got = flash_attention(q, k, v)
        want = ref_attention(q, k, v)
        check_err(got, want, **TOL)

    def test_block_configs(self):
        q, k, v = _qkv(1, 2, 2, 512, 512, 64)
        want = ref_attention(q, k, v, causal=True)
        for cfg in [AttentionConfig(128, 128), AttentionConfig(256, 512)]:
            got = flash_attention(q, k, v, causal=True, config=cfg)
            check_err(got, want, **TOL)

    def test_lse(self):
        q, k, v = _qkv(1, 2, 2, 128, 256, 64)
        _, lse = flash_attention(q, k, v, return_lse=True)
        # reference LSE
        scale = 1.0 / np.sqrt(64)
        s = scale * jnp.einsum(
            "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
        )
        want = jax.scipy.special.logsumexp(s, axis=-1)
        check_err(lse, want, rtol=1e-2, atol=1e-2)


class TestFlashDecode:
    @pytest.mark.parametrize("num_splits", [1, 4, 8])
    def test_splits(self, num_splits):
        q, k, v = _qkv(2, 8, 2, 1, 2048, 64)
        got = flash_decode(q, k, v, num_splits=num_splits)
        want = ref_attention(q, k, v)
        check_err(got, want, **TOL)

    def test_varlen_decode(self):
        q, k, v = _qkv(2, 4, 4, 1, 1024, 64)
        lens = jnp.asarray([700, 129], jnp.int32)
        got = flash_decode(q, k, v, kv_seq_len=lens, num_splits=4)
        want = ref_attention(q, k, v, kv_seq_len=lens)
        check_err(got, want, **TOL)


class TestInt8KV:
    def _quant_kv(self, k, v):
        # per-head symmetric int8 (the int8-KV-cache config in BASELINE.json)
        def q8(x):
            absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(2, 3))
            s = jnp.maximum(absmax / 127.0, 1e-8)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s[:, :, None, None]), -127, 127
            ).astype(jnp.int8)
            return xq, s

        kq, ks = q8(k)
        vq, vs = q8(v)
        return kq, ks, vq, vs

    def test_int8_kv(self):
        q, k, v = _qkv(2, 4, 4, 64, 512, 64)
        kq, ks, vq, vs = self._quant_kv(k, v)
        got = flash_attention(q, kq, vq, k_scale=ks, v_scale=vs, causal=True)
        k_dq = (kq.astype(jnp.float32) * ks[:, :, None, None]).astype(jnp.bfloat16)
        v_dq = (vq.astype(jnp.float32) * vs[:, :, None, None]).astype(jnp.bfloat16)
        want = ref_attention(q, k_dq, v_dq, causal=True)
        check_err(got, want, rtol=3e-2, atol=3e-2)

    def test_int8_kv_decode(self):
        q, k, v = _qkv(1, 8, 2, 1, 1024, 64)
        kq, ks, vq, vs = self._quant_kv(k, v)
        got = flash_decode(q, kq, vq, k_scale=ks, v_scale=vs, num_splits=4)
        k_dq = (kq.astype(jnp.float32) * ks[:, :, None, None]).astype(jnp.bfloat16)
        v_dq = (vq.astype(jnp.float32) * vs[:, :, None, None]).astype(jnp.bfloat16)
        want = ref_attention(q, k_dq, v_dq)
        check_err(got, want, rtol=3e-2, atol=3e-2)


class TestFlashBackward:
    def _grads(self, fn, q, k, v):
        def loss(q_, k_, v_):
            return jnp.sum(fn(q_, k_, v_).astype(jnp.float32) ** 2)

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    @pytest.mark.parametrize("causal", [False, True])
    def test_grads_match_reference(self, causal):
        from composable_kernel_tpu.ops.attention import flash_attention_grad

        q, k, v = _qkv(1, 2, 2, 128, 128, 64)
        got = self._grads(
            lambda q_, k_, v_: flash_attention_grad(q_, k_, v_, causal=causal),
            q, k, v,
        )
        want = self._grads(
            lambda q_, k_, v_: ref_attention(q_, k_, v_, causal=causal), q, k, v
        )
        for g, w, name in zip(got, want, "qkv"):
            check_err(g, w, rtol=5e-2, atol=5e-2, msg=f"d{name}")

    def test_grads_gqa_window(self):
        from composable_kernel_tpu.ops.attention import flash_attention_grad

        q, k, v = _qkv(1, 4, 2, 128, 256, 64)
        got = self._grads(
            lambda q_, k_, v_: flash_attention_grad(
                q_, k_, v_, causal=True, window=64
            ),
            q, k, v,
        )
        want = self._grads(
            lambda q_, k_, v_: ref_attention(q_, k_, v_, causal=True, window=64),
            q, k, v,
        )
        for g, w, name in zip(got, want, "qkv"):
            check_err(g, w, rtol=5e-2, atol=5e-2, msg=f"d{name}")

    def test_grads_bias_dbias(self):
        # dbias parity: CK fmha_bwd_kernel.hpp:97,175-182 emits dBias = dS
        from composable_kernel_tpu.ops.attention import flash_attention_grad

        q, k, v = _qkv(1, 2, 2, 128, 256, 64)
        bias = 0.1 * jax.random.normal(
            jax.random.PRNGKey(7), (1, 2, 128, 256), jnp.float32
        )

        def loss(fn):
            def inner(q_, k_, v_, b_):
                return jnp.sum(fn(q_, k_, v_, b_).astype(jnp.float32) ** 2)
            return jax.grad(inner, argnums=(0, 1, 2, 3))

        got = loss(
            lambda q_, k_, v_, b_: flash_attention_grad(
                q_, k_, v_, b_, causal=True
            )
        )(q, k, v, bias)
        want = loss(
            lambda q_, k_, v_, b_: ref_attention(q_, k_, v_, bias=b_, causal=True)
        )(q, k, v, bias)
        for g, w, name in zip(got, want, ["q", "k", "v", "bias"]):
            check_err(g, w, rtol=5e-2, atol=5e-2, msg=f"d{name}")

    def test_grads_varlen(self):
        from composable_kernel_tpu.ops.attention import flash_attention_grad

        q, k, v = _qkv(2, 2, 2, 128, 256, 64)
        lens = jnp.asarray([100, 256], jnp.int32)
        got = self._grads(
            lambda q_, k_, v_: flash_attention_grad(q_, k_, v_, kv_seq_len=lens),
            q, k, v,
        )
        want = self._grads(
            lambda q_, k_, v_: ref_attention(q_, k_, v_, kv_seq_len=lens),
            q, k, v,
        )
        for g, w, name in zip(got, want, "qkv"):
            check_err(g, w, rtol=5e-2, atol=5e-2, msg=f"d{name}")

    def test_grads_dropout_consistent(self):
        # the bwd regenerates the fwd keep-mask from the per-tile seeds
        # (block_dropout.hpp analog): grads must equal autodiff through an
        # explicit-mask reference built from the SAME forward output.
        from composable_kernel_tpu.ops.attention import flash_attention_grad

        # f32 inputs: the dropout mask is constant in q (bits depend only on
        # the tile seed), so the loss is smooth and FD is accurate.
        kq = jax.random.PRNGKey(0)
        q = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 128, 64), jnp.float32)
        k = jax.random.normal(jax.random.PRNGKey(2), (1, 2, 256, 64), jnp.float32)
        v = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 256, 64), jnp.float32)
        rate, seed = 0.4, 123

        fa = lambda q_, k_, v_: flash_attention_grad(
            q_, k_, v_, dropout_rate=rate, dropout_seed=seed
        )
        w = jax.random.normal(jax.random.PRNGKey(9), q.shape, jnp.float32)

        def loss(q_):
            return jnp.sum(fa(q_, k, v).astype(jnp.float32) * w)

        g = jax.grad(loss)(q)
        d = jax.random.normal(jax.random.PRNGKey(11), q.shape, jnp.float32)
        d = d / jnp.linalg.norm(d.reshape(-1))
        eps = 1e-2  # mask is constant in q; larger eps beats f32 cancellation
        fd = (loss(q + eps * d) - loss(q - eps * d)) / (2 * eps)
        analytic = jnp.sum(g * d)
        np.testing.assert_allclose(float(analytic), float(fd), rtol=2e-2)


class TestDropout:
    def test_rate_zero_is_identity(self):
        q, k, v = _qkv(1, 2, 2, 128, 128, 64)
        base = flash_attention(q, k, v)
        got = flash_attention(q, k, v, dropout_rate=0.0)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(got))

    def test_dropout_statistics(self):
        # with rate p, the PV path keeps ~(1-p) entries rescaled by 1/(1-p):
        # the output mean is preserved and outputs differ from baseline
        q, k, v = _qkv(1, 2, 2, 256, 256, 64)
        base = flash_attention(q, k, v).astype(jnp.float32)
        drop = flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=7).astype(
            jnp.float32
        )
        assert not jnp.allclose(base, drop)
        # mean over many outputs ~ preserved (loose statistical bound)
        rel = float(jnp.abs(jnp.mean(drop) - jnp.mean(base)) /
                    (jnp.abs(jnp.mean(base)) + 1e-3))
        assert rel < 1.0

    def test_deterministic_per_seed(self):
        q, k, v = _qkv(1, 2, 2, 128, 128, 64)
        a = flash_attention(q, k, v, dropout_rate=0.5, dropout_seed=3)
        b = flash_attention(q, k, v, dropout_rate=0.5, dropout_seed=3)
        c = flash_attention(q, k, v, dropout_rate=0.5, dropout_seed=4)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not jnp.allclose(a.astype(jnp.float32), c.astype(jnp.float32))


class TestStaticQuant:
    """Fully-quantized pipeline (CK fp8 static-quant analog on int8 MXU)."""

    def _quantize(self, b, hq, hkv, sq, sk, d):
        from composable_kernel_tpu.reference.attention import (
            ref_quantize_per_tensor,
        )

        q, k, v = _qkv(b, hq, hkv, sq, sk, d, dtype=jnp.float32)
        qq, qs = ref_quantize_per_tensor(q)
        kq, ks = ref_quantize_per_tensor(k)
        vq, vs = ref_quantize_per_tensor(v)
        return (qq, kq, vq), (qs, ks, vs), (q, k, v)

    @pytest.mark.parametrize("causal", [False, True])
    def test_vs_float_reference(self, causal):
        (qq, kq, vq), scales, (q, k, v) = self._quantize(2, 4, 4, 128, 256, 64)
        got = flash_attention(qq, kq, vq, static_quant_scales=scales,
                              causal=causal)
        assert got.dtype == jnp.bfloat16
        want = ref_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), causal=causal,
        )
        # bounded by int8 quantization error of q/k/v and the 7-bit P
        check_err(got, want, rtol=6e-2, atol=6e-2)

    def test_vs_quant_reference(self):
        from composable_kernel_tpu.reference.attention import (
            ref_quant_attention,
        )

        (qq, kq, vq), scales, _ = self._quantize(1, 2, 2, 64, 128, 64)
        got = flash_attention(qq, kq, vq, static_quant_scales=scales)
        want = ref_quant_attention(qq, kq, vq, *scales)
        # same quantized domains; only blockwise-vs-global max placement of
        # the P rounding differs
        check_err(got, want, rtol=2e-2, atol=2e-2)

    def test_gqa_varlen(self):
        (qq, kq, vq), scales, (q, k, v) = self._quantize(2, 4, 2, 64, 256, 64)
        lens = jnp.asarray([100, 256], jnp.int32)
        got = flash_attention(qq, kq, vq, static_quant_scales=scales,
                              kv_seq_len=lens)
        want = ref_attention(
            q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
            v.astype(jnp.bfloat16), kv_seq_len=lens,
        )
        check_err(got, want, rtol=6e-2, atol=6e-2)


class TestAlibi:
    """In-kernel alibi slopes vs a materialized bias tensor (the reference
    formulation): identical math, zero extra HBM traffic."""

    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_bias_tensor(self, causal):
        from composable_kernel_tpu.ops.attention import alibi_slopes_for_heads

        b, hq, hkv, sq, sk, d = 2, 4, 2, 128, 256, 64
        q, k, v = _qkv(b, hq, hkv, sq, sk, d)
        slopes = alibi_slopes_for_heads(hq)
        # bottom-right-aligned positions, matching the kernel convention
        q_pos = np.arange(sq)[:, None] + (sk - sq)
        k_pos = np.arange(sk)[None, :]
        bias = np.broadcast_to(
            slopes[None, :, None, None]
            * (k_pos - q_pos)[None, None].astype(np.float32),
            (b, hq, sq, sk),
        )
        got = flash_attention(q, k, v, causal=causal,
                              alibi_slopes=jnp.asarray(slopes))
        want = flash_attention(q, k, v, causal=causal,
                               bias=jnp.asarray(bias, jnp.float32))
        check_err(got, want, **TOL)

    def test_with_varlen(self):
        from composable_kernel_tpu.ops.attention import alibi_slopes_for_heads

        b, hq, hkv, sq, sk, d = 2, 4, 2, 128, 256, 64
        q, k, v = _qkv(b, hq, hkv, sq, sk, d)
        slopes = alibi_slopes_for_heads(hq)
        lens = jnp.asarray([100, 256], jnp.int32)
        q_pos = np.arange(sq)[:, None] + (sk - sq)
        k_pos = np.arange(sk)[None, :]
        bias = np.broadcast_to(
            slopes[None, :, None, None]
            * (k_pos - q_pos)[None, None].astype(np.float32),
            (b, hq, sq, sk),
        )
        got = flash_attention(q, k, v, causal=True, kv_seq_len=lens,
                              alibi_slopes=jnp.asarray(slopes))
        want = flash_attention(q, k, v, causal=True, kv_seq_len=lens,
                               bias=jnp.asarray(bias, jnp.float32))
        check_err(got, want, **TOL)


def test_tune_selects_and_caches(tmp_path, monkeypatch):
    """flash_attention(tune=True): CPU path returns the first supported
    instance without timing (tuning is a real-backend activity)."""
    monkeypatch.setenv("CKT_TUNE_CACHE", str(tmp_path / "tune.json"))
    q, k, v = _qkv(1, 2, 2, 128, 256, 64)
    got = flash_attention(q, k, v, causal=True, tune=True)
    want = ref_attention(q, k, v, causal=True)
    check_err(got, want, **TOL)


class TestVarlenPacked:
    """Group-mode packed-varlen attention (ck_tile fmha_fwd_kernel.hpp
    seqstart walk, :505-555): zero padded compute, block-aligned packing."""

    def test_mixed_batch_matches_per_seq(self):
        from composable_kernel_tpu.ops.attention import (
            flash_attention_varlen,
            pack_varlen,
            unpack_varlen,
        )

        hq, hkv, d = 8, 2, 64
        lens = [200, 512, 37, 260]
        rngk = jax.random.split(jax.random.PRNGKey(3), 12)
        qs, ks_, vs = [], [], []
        for i, L in enumerate(lens):
            qs.append(jax.random.normal(rngk[3 * i], (L, hq, d),
                                        jnp.float32).astype(jnp.bfloat16))
            ks_.append(jax.random.normal(rngk[3 * i + 1], (L, hkv, d),
                                         jnp.float32).astype(jnp.bfloat16))
            vs.append(jax.random.normal(rngk[3 * i + 2], (L, hkv, d),
                                        jnp.float32).astype(jnp.bfloat16))
        qp, q_starts, q_lens = pack_varlen(qs, 512)
        kp, kv_starts, kv_lens = pack_varlen(ks_, 1024)
        vp, _, _ = pack_varlen(vs, 1024)
        out = flash_attention_varlen(qp, kp, vp, q_starts, q_lens,
                                     kv_starts, kv_lens, causal=True)
        outs = unpack_varlen(out, q_starts, q_lens)
        for i, L in enumerate(lens):
            want = ref_attention(
                qs[i].transpose(1, 0, 2)[None],
                ks_[i].transpose(1, 0, 2)[None],
                vs[i].transpose(1, 0, 2)[None], causal=True,
            )[0].transpose(1, 0, 2)
            check_err(outs[i], want, **TOL)

    def test_chunked_prefill_alignment(self):
        # q is the tail chunk of a longer KV: bottom-right causal per seq
        from composable_kernel_tpu.ops.attention import (
            flash_attention_varlen,
            pack_varlen,
        )

        hq, hkv, d = 4, 2, 64
        L_kv, L_q = 300, 64
        rngk = jax.random.split(jax.random.PRNGKey(4), 3)
        q = jax.random.normal(rngk[0], (L_q, hq, d), jnp.float32).astype(jnp.bfloat16)
        k = jax.random.normal(rngk[1], (L_kv, hkv, d), jnp.float32).astype(jnp.bfloat16)
        v = jax.random.normal(rngk[2], (L_kv, hkv, d), jnp.float32).astype(jnp.bfloat16)
        qp, qs_, ql = pack_varlen([q], 512)
        kp, ks2, kl = pack_varlen([k], 1024)
        vp, _, _ = pack_varlen([v], 1024)
        out = flash_attention_varlen(qp, kp, vp, qs_, ql, ks2, kl,
                                     causal=True)[:L_q]
        want = ref_attention(
            q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
            v.transpose(1, 0, 2)[None], causal=True,
        )[0].transpose(1, 0, 2)
        check_err(out, want, **TOL)

    def test_traced_lens_jit(self):
        # lens/starts may be traced (serving builds them per batch)
        from composable_kernel_tpu.ops.attention import (
            flash_attention_varlen,
            pack_varlen,
        )

        hq, hkv, d = 4, 2, 64
        qs_l = [jax.random.normal(KEYS[i], (128, hq, d), jnp.float32).astype(jnp.bfloat16)
                for i in range(2)]
        ks_l = [jax.random.normal(KEYS[i + 2], (128, hkv, d), jnp.float32).astype(jnp.bfloat16)
                for i in range(2)]
        vs_l = [jax.random.normal(KEYS[i + 4], (128, hkv, d), jnp.float32).astype(jnp.bfloat16)
                for i in range(2)]
        qp, qs_, ql = pack_varlen(qs_l, 128)
        kp, ks2, kl = pack_varlen(ks_l, 128)
        vp, _, _ = pack_varlen(vs_l, 128)

        @jax.jit
        def f(qp, kp, vp, qs_, ql, ks2, kl):
            return flash_attention_varlen(qp, kp, vp, qs_, ql, ks2, kl,
                                          causal=True, block_q=128,
                                          block_k=128)

        out = f(qp, kp, vp, qs_, ql, ks2, kl)
        want = flash_attention_varlen(qp, kp, vp, qs_, ql, ks2, kl,
                                      causal=True, block_q=128, block_k=128)
        check_err(out, want, rtol=1e-3, atol=1e-3)


class TestVarlenCache:
    """Packed chunk queries vs per-slot KV caches
    (flash_attention_varlen_cache): the chunked-prefill composition of
    ck_tile's group mode (fmha_fwd_kernel.hpp:505-555) with a mid-prefill
    cache."""

    def _setup(self, chunk_lens, pos, hq=8, hkv=2, d=64, s_max=1024,
               int8=False, seed=7):
        from composable_kernel_tpu.ops.attention import pack_varlen

        b = len(chunk_lens)
        rng = jax.random.split(jax.random.PRNGKey(seed), 3 * b + 1)
        qs = [
            jax.random.normal(rng[3 * i], (L, hq, d), jnp.float32).astype(
                jnp.bfloat16
            )
            if L
            else jnp.zeros((0, hq, d), jnp.bfloat16)
            for i, L in enumerate(chunk_lens)
        ]
        kv_lens = [p + L for p, L in zip(pos, chunk_lens)]
        ck = jnp.zeros((b, hkv, s_max, d), jnp.float32)
        cv = jnp.zeros((b, hkv, s_max, d), jnp.float32)
        for i in range(b):
            kl = kv_lens[i]
            ck = ck.at[i, :, :kl].set(
                jax.random.normal(rng[3 * i + 1], (hkv, kl, d))
            )
            cv = cv.at[i, :, :kl].set(
                jax.random.normal(rng[3 * i + 2], (hkv, kl, d))
            )
        scales = {}
        if int8:
            ks = jnp.maximum(jnp.max(jnp.abs(ck), axis=(2, 3)) / 127.0, 1e-6)
            vs = jnp.maximum(jnp.max(jnp.abs(cv), axis=(2, 3)) / 127.0, 1e-6)
            ck = jnp.clip(jnp.round(ck / ks[:, :, None, None]), -127, 127
                          ).astype(jnp.int8)
            cv = jnp.clip(jnp.round(cv / vs[:, :, None, None]), -127, 127
                          ).astype(jnp.int8)
            scales = {"k_scale": ks, "v_scale": vs}
        else:
            ck, cv = ck.astype(jnp.bfloat16), cv.astype(jnp.bfloat16)
        qp, starts, lens = pack_varlen(qs, 256)
        return qp, ck, cv, starts, lens, jnp.asarray(kv_lens, jnp.int32), scales

    def _check(self, chunk_lens, pos, window=None, int8=False):
        from composable_kernel_tpu.ops.attention import (
            flash_attention_varlen_cache,
        )
        from composable_kernel_tpu.reference.attention import (
            ref_attention_varlen_cache,
        )

        qp, ck, cv, starts, lens, kv_lens, scales = self._setup(
            chunk_lens, pos, int8=int8
        )
        out = flash_attention_varlen_cache(
            qp, ck, cv, starts, lens, kv_lens, window=window, **scales
        )
        want = ref_attention_varlen_cache(
            qp, ck, cv, np.asarray(starts), np.asarray(lens),
            np.asarray(kv_lens), window=window,
            k_scale=scales.get("k_scale"), v_scale=scales.get("v_scale"),
        )
        for i, L in enumerate(chunk_lens):
            s0 = int(starts[i])
            if L:
                check_err(out[s0 : s0 + L], want[s0 : s0 + L], **TOL,
                          msg=f"seq {i}")

    def test_mixed_chunks_mid_prefill(self):
        # ragged chunk lens at ragged positions (incl. pos=0 first chunk)
        self._check([256, 100, 256, 30], [0, 300, 512, 700])

    def test_int8_cache_per_head_scales(self):
        self._check([128, 256, 64], [100, 0, 640], int8=True)

    def test_zero_length_finished_slot(self):
        self._check([256, 0, 90], [128, 500, 0])

    def test_sliding_window(self):
        self._check([256, 256], [300, 100], window=128)
