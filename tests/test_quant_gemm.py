"""S2 tests: weight-only dequant GEMM + int8 requant GEMM.

Mirrors the reference test strategy (SURVEY.md §4): every kernel run is
checked against the pure-jnp host reference with per-dtype `check_err`
tolerances; shape sweeps include the decode shapes (M=1..6, odd sizes) from
test_gemm_universal_ut_cases.inc:3-49 and profile_mixed_gemm.sh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.ops import epilogues as ep
from composable_kernel_tpu.ops.quant import dequant_gemm, int8_gemm
from composable_kernel_tpu.reference import quant as rq
from composable_kernel_tpu.utils.check_err import check_err


def _rand(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


KEYS = jax.random.split(jax.random.PRNGKey(0), 8)


class TestInt8PerChannel:
    @pytest.mark.parametrize("m", [1, 3, 6, 16, 127, 256])
    def test_shapes(self, m):
        n, k = 384, 512
        a = _rand(KEYS[0], (m, k))
        w = _rand(KEYS[1], (k, n), jnp.float32)
        w_q, s = rq.ref_quantize_per_channel(w)
        got = dequant_gemm(a, w_q, s)
        want = rq.ref_dequant_gemm(a, w_q, s)
        check_err(got, want)

    @pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16, jnp.float32])
    def test_dtypes(self, dtype):
        a = _rand(KEYS[0], (64, 256), dtype)
        w = _rand(KEYS[1], (256, 256), jnp.float32)
        w_q, s = rq.ref_quantize_per_channel(w)
        # scale applied post-accumulation in the kernel vs pre-matmul in the
        # reference: legitimate f32 rounding-order difference, so the f32
        # case uses a relaxed bound (CK quantized examples do the same).
        tol = {"rtol": 1e-4, "atol": 5e-5} if dtype == jnp.float32 else {}
        check_err(dequant_gemm(a, w_q, s), rq.ref_dequant_gemm(a, w_q, s), **tol)

    def test_epilogue_bias_gelu(self):
        # the CK client fusion variants: plain / bias / gelu / bias_fastgelu
        m, n, k = 32, 256, 256
        a = _rand(KEYS[0], (m, k))
        w_q, s = rq.ref_quantize_per_channel(_rand(KEYS[1], (k, n), jnp.float32))
        bias = _rand(KEYS[2], (n,), jnp.float32)
        got = dequant_gemm(a, w_q, s, ds=(bias,), c_op=ep.add_fast_gelu)
        want = rq.ref_dequant_gemm(a, w_q, s, ds=(bias,), c_op=ep.add_fast_gelu)
        check_err(got, want)


class TestInt8Group:
    @pytest.mark.parametrize("group_size", [64, 128, 256])
    def test_group_sizes(self, group_size):
        m, n, k = 32, 256, 512
        a = _rand(KEYS[0], (m, k))
        w_q, s = rq.ref_quantize_group(
            _rand(KEYS[1], (k, n), jnp.float32), group_size=group_size, bits=8
        )
        got = dequant_gemm(a, w_q, s, group_size=group_size)
        want = rq.ref_dequant_gemm(a, w_q, s, group_size=group_size)
        check_err(got, want)

    def test_block_spans_multiple_groups(self):
        # bk=512 spans 4 groups of 128 -> in-tile reshape-dequant path
        from composable_kernel_tpu.ops.gemm.config import GemmConfig

        m, n, k, g = 16, 256, 1024, 128
        a = _rand(KEYS[0], (m, k))
        w_q, s = rq.ref_quantize_group(_rand(KEYS[1], (k, n), jnp.float32), g, bits=8)
        got = dequant_gemm(a, w_q, s, group_size=g, config=GemmConfig(block_k=512))
        check_err(got, rq.ref_dequant_gemm(a, w_q, s, group_size=g))


class TestInt4Packed:
    @pytest.mark.parametrize("m", [1, 4, 16, 64])
    def test_decode_shapes_g128(self, m):
        # the BASELINE.json config: fp16 x int4 g=128, decode M=1..64
        n, k, g = 512, 1024, 128
        a = _rand(KEYS[0], (m, k), jnp.float16)
        w_q, s = rq.ref_quantize_group(_rand(KEYS[1], (k, n), jnp.float32), g, bits=4)
        packed = dtypes.pack_int4(w_q, axis=0)
        got = dequant_gemm(a, packed, s, group_size=g, packed_int4=True)
        want = rq.ref_dequant_gemm(a, packed, s, group_size=g, packed_int4=True)
        check_err(got, want)

    def test_per_channel(self):
        m, n, k = 16, 256, 512
        a = _rand(KEYS[0], (m, k))
        w_q, s = rq.ref_quantize_per_channel(_rand(KEYS[1], (k, n), jnp.float32), bits=4)
        packed = dtypes.pack_int4(w_q, axis=0)
        got = dequant_gemm(a, packed, s, packed_int4=True)
        want = rq.ref_dequant_gemm(a, packed, s, packed_int4=True)
        check_err(got, want)

    def test_pack_roundtrip(self):
        w = jnp.array(np.random.randint(-8, 8, size=(64, 32)), jnp.int8)
        assert (dtypes.unpack_int4(dtypes.pack_int4(w)) == w).all()

    def test_large_k_deep_group(self):
        # bpk spans multiple groups (bpk=512 > g=128 after halving k=2048)
        from composable_kernel_tpu.ops.gemm.config import GemmConfig

        m, n, k, g = 8, 256, 2048, 128
        a = _rand(KEYS[0], (m, k))
        w_q, s = rq.ref_quantize_group(_rand(KEYS[1], (k, n), jnp.float32), g, bits=4)
        packed = dtypes.pack_int4(w_q, axis=0)
        got = dequant_gemm(
            a, packed, s, group_size=g, packed_int4=True,
            config=GemmConfig(block_k=1024),
        )
        check_err(got, rq.ref_dequant_gemm(a, packed, s, group_size=g, packed_int4=True))


class TestInt8Requant:
    def test_relu_requant_exact(self):
        # integer path must be bit-exact (check_err.hpp:178-210 contract)
        m, n, k = 32, 128, 256
        a_q = jnp.array(np.random.randint(-128, 128, (m, k)), jnp.int8)
        b_q = jnp.array(np.random.randint(-128, 128, (k, n)), jnp.int8)
        op = ep.activation_mul_clamp(ep.relu, 0.0123)
        got = int8_gemm(a_q, b_q, op)
        want = rq.ref_int8_gemm_requant(a_q, b_q, op)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_bias_requant(self):
        m, n, k = 16, 128, 128
        a_q = jnp.array(np.random.randint(-128, 128, (m, k)), jnp.int8)
        b_q = jnp.array(np.random.randint(-128, 128, (k, n)), jnp.int8)
        bias = jnp.array(np.random.randint(-1000, 1000, (n,)), jnp.int32)
        op = ep.add_activation_mul_clamp(ep.relu, 0.0077)
        got = int8_gemm(a_q, b_q, op, ds=(bias,))
        want = rq.ref_int8_gemm_requant(a_q, b_q, op, ds=(bias,))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_add_add_fastgelu_requant(self):
        # BASELINE config 3: int8 GEMM, bias + residual adds, fastgelu
        # activation, requant to int8 — all fused on the accumulator tile.
        m, n, k = 16, 128, 128
        a_q = jnp.array(np.random.randint(-128, 128, (m, k)), jnp.int8)
        b_q = jnp.array(np.random.randint(-128, 128, (k, n)), jnp.int8)
        bias = jnp.array(np.random.randint(-1000, 1000, (n,)), jnp.int32)
        resid = jnp.array(np.random.randint(-1000, 1000, (m, n)), jnp.int32)
        op = ep.add_add_mul_activation_mul_clamp(ep.fast_gelu, 0.002, 31.0)
        got = int8_gemm(a_q, b_q, op, ds=(resid, bias))
        want = rq.ref_int8_gemm_requant(a_q, b_q, op, ds=(resid, bias))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestInt4Segmented:
    def test_pack_blocks_roundtrip(self):
        w = jnp.array(np.random.randint(-8, 8, size=(256, 32)), jnp.int8)
        p = dtypes.pack_int4(w, axis=0, blocks=4)
        assert (dtypes.unpack_int4(p, axis=0, blocks=4) == w).all()

    @pytest.mark.parametrize("blocks", [2, 4])
    def test_segmented_kernel(self, blocks):
        # the TP row-block layout: kernel must honor per-segment halves
        m, n, k, g = 16, 256, 1024, 128
        a = _rand(KEYS[0], (m, k))
        w_q, s = rq.ref_quantize_group(_rand(KEYS[1], (k, n), jnp.float32), g, bits=4)
        packed = dtypes.pack_int4(w_q, axis=0, blocks=blocks)
        got = dequant_gemm(
            a, packed, s, group_size=g, packed_int4=True, pack_blocks=blocks
        )
        want = rq.ref_dequant_gemm(
            a, packed, s, group_size=g, packed_int4=True, pack_blocks=blocks
        )
        check_err(got, want)

    def test_segment_equals_shard(self):
        # shard i of a blocks=B pack == standalone pack of W's i-th K block
        k, n, B = 512, 64, 4
        w = jnp.array(np.random.randint(-8, 8, (k, n)), jnp.int8)
        p_full = dtypes.pack_int4(w, axis=0, blocks=B)
        shard = p_full[k // 2 // B : 2 * (k // 2 // B)]  # shard 1
        standalone = dtypes.pack_int4(w[k // B : 2 * (k // B)], axis=0)
        assert (shard == standalone).all()


class TestFp8AbScale:
    def test_fp8_gemm_blockwise(self):
        from composable_kernel_tpu.ops.quant.fp8 import (
            fp8_gemm_ab_scale,
            quantize_fp8_blockwise,
            ref_fp8_gemm_ab_scale,
        )

        m, n, k = 64, 256, 512
        a = _rand(KEYS[0], (m, k), jnp.float32) * 3.0
        b = _rand(KEYS[1], (k, n), jnp.float32)
        a_q, a_s = quantize_fp8_blockwise(a, (1, 128))
        b_q, b_s = quantize_fp8_blockwise(b, (128, 128))
        got = fp8_gemm_ab_scale(a_q, a_s, b_q, b_s)
        want = ref_fp8_gemm_ab_scale(a_q, a_s, b_q, b_s)
        check_err(got, want, rtol=2e-2, atol=2e-2)
        # quantization fidelity vs the unquantized product
        full = (a @ b).astype(jnp.bfloat16)
        rel = float(
            jnp.linalg.norm(want.astype(jnp.float32) - full.astype(jnp.float32))
            / jnp.linalg.norm(full.astype(jnp.float32))
        )
        assert rel < 0.1, rel

    def test_fp8_epilogue(self):
        from composable_kernel_tpu.ops.quant.fp8 import (
            fp8_gemm_ab_scale,
            quantize_fp8_blockwise,
            ref_fp8_gemm_ab_scale,
        )

        m, n, k = 32, 128, 256
        a_q, a_s = quantize_fp8_blockwise(_rand(KEYS[0], (m, k), jnp.float32), (1, 128))
        b_q, b_s = quantize_fp8_blockwise(_rand(KEYS[1], (k, n), jnp.float32), (128, 128))
        d0 = _rand(KEYS[2], (n,), jnp.float32)
        got = fp8_gemm_ab_scale(a_q, a_s, b_q, b_s, ds=(d0,), c_op=ep.add_fast_gelu)
        want = ref_fp8_gemm_ab_scale(a_q, a_s, b_q, b_s, ds=(d0,), c_op=ep.add_fast_gelu)
        check_err(got, want, rtol=2e-2, atol=2e-2)


class TestOddShapes:
    @pytest.mark.parametrize("m,n", [(7, 129), (33, 300), (1, 511)])
    def test_dequant_odd_n(self, m, n):
        k = 512
        a = _rand(KEYS[0], (m, k))
        w_q, s = rq.ref_quantize_per_channel(_rand(KEYS[1], (k, n), jnp.float32))
        check_err(dequant_gemm(a, w_q, s), rq.ref_dequant_gemm(a, w_q, s))

    def test_int4_odd_n(self):
        m, n, k, g = 5, 250, 512, 128
        a = _rand(KEYS[0], (m, k))
        w_q, s = rq.ref_quantize_group(_rand(KEYS[1], (k, n), jnp.float32), g, bits=4)
        packed = dtypes.pack_int4(w_q, axis=0)
        got = dequant_gemm(a, packed, s, group_size=g, packed_int4=True)
        check_err(got, rq.ref_dequant_gemm(a, packed, s, group_size=g, packed_int4=True))
