"""W4A8 path tests: AND-only int4 pack, int8-MXU dot kernel vs reference.

Strategy per SURVEY.md §4: kernel output compared against the pure-jnp
reference (``reference.quant.ref_w4a8_gemm``) with per-dtype tolerances.
The integer dots are exact in both; the only divergence is f32 group-scale
accumulation order (kernel: split-halves step order, reference: logical
group order), which bf16/f32 tolerances absorb.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.ops import epilogues as ep
from composable_kernel_tpu.ops.quant import quantize_act_token, w4a8_gemm
from composable_kernel_tpu.reference import quant as rq
from composable_kernel_tpu.utils.check_err import check_err

KEYS = jax.random.split(jax.random.PRNGKey(7), 8)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


class TestPackW4A8:
    @pytest.mark.parametrize("blocks", [1, 2, 4])
    def test_round_trip(self, blocks):
        w = jax.random.randint(KEYS[0], (64, 48), -8, 8, jnp.int8)
        packed = dtypes.pack_int4_w4a8(w, blocks=blocks)
        assert packed.shape == (32, 48)
        got = dtypes.unpack_int4_w4a8(packed, blocks=blocks)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(w))

    def test_nibble_identities(self):
        """The kernel's two-AND extraction must be exact on every value."""
        w = jnp.arange(-8, 8, dtype=jnp.int8)
        lo, hi = w, w[::-1]
        packed = (((lo + 8) & 0x0F) | (hi << 4)).astype(jnp.int8)
        l8 = packed & jnp.int8(0x0F)
        h16 = packed & jnp.int8(-16)
        np.testing.assert_array_equal(np.asarray(l8 - 8, np.int32), np.asarray(lo, np.int32))
        np.testing.assert_array_equal(np.asarray(h16, np.int32), 16 * np.asarray(hi, np.int32))


def _setup(m, n, k, group_size, key0=0):
    a = _rand(KEYS[key0], (m, k))
    w = _rand(KEYS[key0 + 1], (k, n)) * 0.1
    a_q, a_s = quantize_act_token(a)
    w_q, w_s = rq.ref_quantize_group(w, group_size=group_size, bits=4)
    return a, a_q, a_s, w_q, w_s


class TestW4A8Gemm:
    @pytest.mark.parametrize("m", [1, 3, 8, 16, 64, 130])
    def test_shapes(self, m):
        n, k, g = 384, 512, 128
        _, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        packed = dtypes.pack_int4_w4a8(w_q)
        got = w4a8_gemm(a_q, a_s, packed, w_s, group_size=g)
        want = rq.ref_w4a8_gemm(a_q, a_s, w_q, w_s, group_size=g)
        check_err(got, want)

    @pytest.mark.parametrize("offset_corr", ["inline", "external"])
    def test_offset_corr_modes(self, offset_corr):
        m, n, k, g = 16, 256, 512, 128
        _, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        packed = dtypes.pack_int4_w4a8(w_q)
        got = w4a8_gemm(
            a_q, a_s, packed, w_s, group_size=g, offset_corr=offset_corr
        )
        want = rq.ref_w4a8_gemm(a_q, a_s, w_q, w_s, group_size=g)
        check_err(got, want)

    @pytest.mark.parametrize("group_size", [64, 128, 256, 512])
    def test_group_sizes(self, group_size):
        m, n, k = 16, 256, 512
        _, a_q, a_s, w_q, w_s = _setup(m, n, k, group_size)
        packed = dtypes.pack_int4_w4a8(w_q)
        got = w4a8_gemm(a_q, a_s, packed, w_s, group_size=group_size)
        want = rq.ref_w4a8_gemm(a_q, a_s, w_q, w_s, group_size=group_size)
        check_err(got, want)

    def test_group_spans_whole_k(self):
        # group_size == K: the per-channel-like degenerate case (one group;
        # exercises group_size > half_seg and cross-step corrections)
        m, n, k = 8, 256, 256
        _, a_q, a_s, w_q, w_s = _setup(m, n, k, k)
        packed = dtypes.pack_int4_w4a8(w_q)
        got = w4a8_gemm(a_q, a_s, packed, w_s, group_size=k)
        want = rq.ref_w4a8_gemm(a_q, a_s, w_q, w_s, group_size=k)
        check_err(got, want)

    def test_pack_blocks_tp_layout(self):
        m, n, k, g = 16, 256, 1024, 128
        _, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        packed = dtypes.pack_int4_w4a8(w_q, blocks=2)
        got = w4a8_gemm(a_q, a_s, packed, w_s, group_size=g, pack_blocks=2)
        want = rq.ref_w4a8_gemm(a_q, a_s, w_q, w_s, group_size=g)
        check_err(got, want)

    def test_awkward_k(self):
        # half segment with a prime block count (1280/2 = 640 = 5*128), the
        # K=11008-class shape that needs fit_packed_block's divisor search
        m, n, k, g = 8, 256, 1280, 128
        _, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        packed = dtypes.pack_int4_w4a8(w_q)
        got = w4a8_gemm(a_q, a_s, packed, w_s, group_size=g)
        want = rq.ref_w4a8_gemm(a_q, a_s, w_q, w_s, group_size=g)
        check_err(got, want)

    def test_odd_n(self):
        # N not a lane multiple: pad path
        m, n, k, g = 8, 300, 256, 128
        _, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        packed = dtypes.pack_int4_w4a8(w_q)
        got = w4a8_gemm(a_q, a_s, packed, w_s, group_size=g)
        want = rq.ref_w4a8_gemm(a_q, a_s, w_q, w_s, group_size=g)
        check_err(got, want)

    def test_epilogue_bias(self):
        m, n, k, g = 16, 256, 256, 128
        _, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        bias = _rand(KEYS[4], (n,))
        packed = dtypes.pack_int4_w4a8(w_q)
        got = w4a8_gemm(a_q, a_s, packed, w_s, ds=(bias,), group_size=g, c_op=ep.add)
        want = rq.ref_w4a8_gemm(a_q, a_s, w_q, w_s, ds=(bias,), group_size=g, c_op=ep.add)
        check_err(got, want)

    def test_f32_out(self):
        m, n, k, g = 8, 128, 256, 128
        _, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        packed = dtypes.pack_int4_w4a8(w_q)
        got = w4a8_gemm(a_q, a_s, packed, w_s, group_size=g, out_dtype=jnp.float32)
        want = rq.ref_w4a8_gemm(
            a_q, a_s, w_q, w_s, group_size=g, out_dtype=jnp.float32
        )
        check_err(got, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize(
        "m,n,k,g",
        [(1, 256, 512, 128), (8, 384, 1024, 128), (130, 300, 512, 128),
         (16, 256, 1024, 64), (8, 256, 256, 256)],
    )
    def test_fused_act_quant(self, m, n, k, g):
        """a_scales=None: in-kernel per-token quant must be bit-identical
        to quantize_act_token + the pre-quantized kernel path."""
        a, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        a16 = a.astype(jnp.bfloat16)
        a_q, a_s = quantize_act_token(a16)
        packed = dtypes.pack_int4_w4a8(w_q)
        want = w4a8_gemm(a_q, a_s, packed, w_s, group_size=g)
        got = w4a8_gemm(a16, None, packed, w_s, group_size=g)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fused_act_quant_pack_blocks(self):
        m, n, k, g = 16, 256, 1024, 128
        a, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        a16 = a.astype(jnp.bfloat16)
        a_q, a_s = quantize_act_token(a16)
        packed = dtypes.pack_int4_w4a8(w_q, blocks=2)
        want = w4a8_gemm(a_q, a_s, packed, w_s, group_size=g, pack_blocks=2)
        got = w4a8_gemm(a16, None, packed, w_s, group_size=g, pack_blocks=2)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_fused_act_quant_epilogue(self):
        m, n, k, g = 8, 256, 512, 128
        a, a_q, a_s, w_q, w_s = _setup(m, n, k, g)
        a16 = a.astype(jnp.bfloat16)
        a_q, a_s = quantize_act_token(a16)
        bias = _rand(KEYS[4], (n,))
        packed = dtypes.pack_int4_w4a8(w_q)
        want = w4a8_gemm(a_q, a_s, packed, w_s, ds=(bias,), group_size=g,
                         c_op=ep.add)
        got = w4a8_gemm(a16, None, packed, w_s, ds=(bias,), group_size=g,
                        c_op=ep.add)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_quantize_act_token_jit_stable(self):
        """The scale chain must be bit-stable across the jit boundary (XLA
        rewrites /const under jit; the reciprocal-multiply form is used
        everywhere so eager == jit == in-kernel)."""
        x = _rand(KEYS[6], (16, 1024), jnp.bfloat16)
        q1, s1 = quantize_act_token(x)
        q2, s2 = jax.jit(quantize_act_token)(x)
        np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    def test_end_to_end_accuracy(self):
        """Isolate the A8 cost: W4A8 must track the W4A16 path closely.

        (vs FULL precision both are dominated by the identical W4 g=128
        quantization noise, ~11% on gaussian weights — that term cancels
        in this comparison, leaving only per-token int8 activation error.)
        """
        m, n, k, g = 32, 512, 1024, 128
        a, a_q, a_s, w_q, w_s = _setup(m, n, k, g, key0=2)
        packed = dtypes.pack_int4_w4a8(w_q)
        got = np.asarray(
            w4a8_gemm(a_q, a_s, packed, w_s, group_size=g, out_dtype=jnp.float32)
        )
        w4a16 = np.asarray(
            rq.ref_dequant_gemm(
                a.astype(jnp.float32), w_q, w_s, group_size=g,
                out_dtype=jnp.float32,
            )
        )
        rel = np.linalg.norm(got - w4a16) / np.linalg.norm(w4a16)
        assert rel < 0.01, rel


class TestRmsnormQuant:
    def test_matches_unfused(self):
        from composable_kernel_tpu.ops.normalization import rmsnorm_quant

        x = _rand(KEYS[0], (2, 3, 256), jnp.float32)
        g = _rand(KEYS[1], (256,), jnp.float32) * 0.1 + 1.0
        q, s = rmsnorm_quant(x, g, eps=1e-6)
        assert q.shape == x.shape and q.dtype == jnp.int8
        assert s.shape == (2, 3, 1)
        # unfused reference: f32 rmsnorm then per-token quant
        xf = x.astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(ms + 1e-6) * g
        want_q, want_s = rq.ref_quantize_act_token(y)
        np.testing.assert_allclose(
            np.asarray(s).ravel(), np.asarray(want_s).ravel(), rtol=1e-5
        )
        # +-1 quant-step agreement (rounding of identical f32 math)
        diff = np.abs(
            np.asarray(q, np.int32) - np.asarray(want_q, np.int32).reshape(q.shape)
        )
        assert diff.max() <= 1, diff.max()

    def test_feeds_w4a8_gemm(self):
        from composable_kernel_tpu.ops.normalization import rmsnorm_quant

        m, n, k, g = 8, 256, 256, 128
        x = _rand(KEYS[2], (m, k), jnp.float32)
        gamma = jnp.ones((k,), jnp.float32)
        w = _rand(KEYS[3], (k, n)) * 0.1
        w_q, w_s = rq.ref_quantize_group(w, group_size=g, bits=4)
        packed = dtypes.pack_int4_w4a8(w_q)
        q, s = rmsnorm_quant(x, gamma)
        got = w4a8_gemm(q, s, packed, w_s, group_size=g)
        want = rq.ref_w4a8_gemm(q, s, w_q, w_s, group_size=g)
        check_err(got, want)


class TestQuantizeActToken:
    def test_matches_reference(self):
        x = _rand(KEYS[5], (16, 384), jnp.bfloat16)
        got_q, got_s = quantize_act_token(x)
        want_q, want_s = rq.ref_quantize_act_token(x)
        np.testing.assert_array_equal(np.asarray(got_q), np.asarray(want_q))
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s))

    def test_range(self):
        x = _rand(KEYS[6], (8, 256)) * 100.0
        q, s = quantize_act_token(x)
        assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) <= 127
        rec = q.astype(jnp.float32) * s
        rel = jnp.linalg.norm(rec - x) / jnp.linalg.norm(x)
        assert float(rel) < 0.01


class TestW8A8Gemm:
    def test_matches_f64_reference(self):
        from composable_kernel_tpu.ops.quant import w8a8_gemm

        m, n, k = 16, 384, 512
        a = _rand(KEYS[0], (m, k))
        w = _rand(KEYS[1], (k, n)) * 0.1
        a_q, a_s = quantize_act_token(a)
        w_q, w_s = rq.ref_quantize_per_channel(w, bits=8)
        got = np.asarray(
            w8a8_gemm(a_q, a_s, w_q, w_s, out_dtype=jnp.float32)
        )
        want = (
            np.asarray(a_q, np.int64) @ np.asarray(w_q, np.int64)
        ).astype(np.float64) * np.asarray(w_s, np.float64)[None, :]
        want = want * np.asarray(a_s, np.float64)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_epilogue_and_decode_shape(self):
        from composable_kernel_tpu.ops import epilogues as ep
        from composable_kernel_tpu.ops.quant import w8a8_gemm

        m, n, k = 1, 256, 256
        a = _rand(KEYS[2], (m, k))
        w = _rand(KEYS[3], (k, n)) * 0.1
        bias = _rand(KEYS[4], (n,))
        a_q, a_s = quantize_act_token(a)
        w_q, w_s = rq.ref_quantize_per_channel(w, bits=8)
        got = np.asarray(
            w8a8_gemm(a_q, a_s, w_q, w_s, ds=(bias,), c_op=ep.add,
                      out_dtype=jnp.float32)
        )
        base = (
            np.asarray(a_q, np.int64) @ np.asarray(w_q, np.int64)
        ).astype(np.float64) * np.asarray(w_s, np.float64)[None, :]
        want = (base + np.asarray(bias, np.float64)[None, :]) * np.asarray(
            a_s, np.float64
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    def test_close_to_w8a16(self):
        from composable_kernel_tpu.ops.quant import dequant_gemm, w8a8_gemm

        m, n, k = 32, 512, 512
        a = _rand(KEYS[5], (m, k))
        w = _rand(KEYS[6], (k, n)) * 0.1
        a_q, a_s = quantize_act_token(a)
        w_q, w_s = rq.ref_quantize_per_channel(w, bits=8)
        got = np.asarray(w8a8_gemm(a_q, a_s, w_q, w_s, out_dtype=jnp.float32))
        want = np.asarray(
            dequant_gemm(a.astype(jnp.bfloat16), w_q, w_s,
                         out_dtype=jnp.float32)
        )
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.02, rel


class TestFusedNormW4A8:
    """Megakernel front: w4a8_gemm(x, None, w, gamma=...) must be
    bit-identical to rmsnorm_quant(x, gamma) -> w4a8_gemm."""

    @pytest.mark.parametrize("m,n,k,g", [(8, 384, 512, 128),
                                         (1, 256, 1024, 256),
                                         (33, 300, 512, 128)])
    def test_bit_parity(self, m, n, k, g):
        from composable_kernel_tpu.ops import normalization as norm_ops

        ks = jax.random.split(jax.random.PRNGKey(m), 3)
        x = jax.random.normal(ks[0], (m, k), jnp.float32).astype(jnp.bfloat16)
        gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (k,), jnp.float32)
        w = jax.random.normal(ks[2], (k, n), jnp.float32) * 0.1
        w_q, w_s = rq.ref_quantize_group(w, group_size=g, bits=4)
        packed = dtypes.pack_int4_w4a8(w_q)
        x_q, x_s = norm_ops.rmsnorm_quant(x, gamma)
        want = w4a8_gemm(x_q, x_s, packed, w_s, group_size=g)
        got = w4a8_gemm(x, None, packed, w_s, group_size=g, gamma=gamma)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_prepared_leaf(self):
        from composable_kernel_tpu.ops import normalization as norm_ops
        from composable_kernel_tpu.ops.quant import prepare_w4a8

        m, n, k, g = 8, 300, 512, 128
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        x = jax.random.normal(ks[0], (m, k), jnp.float32).astype(jnp.bfloat16)
        gamma = 1.0 + 0.1 * jax.random.normal(ks[1], (k,), jnp.float32)
        w = jax.random.normal(ks[2], (k, n), jnp.float32) * 0.1
        w_q, w_s = rq.ref_quantize_group(w, group_size=g, bits=4)
        prep = prepare_w4a8(dtypes.pack_int4_w4a8(w_q), w_s, group_size=g)
        x_q, x_s = norm_ops.rmsnorm_quant(x, gamma)
        want = w4a8_gemm(x_q, x_s, prep)
        got = w4a8_gemm(x, None, prep, gamma=gamma)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
