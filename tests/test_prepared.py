"""Prepared (load-time) weight layouts: bit-parity with the raw paths.

The serving decode loop must not re-pad weights or re-expand scale blocks
per step (ops/quant/prepared.py docstring; CK analog: the device-op
Argument/descriptor split). These tests pin (a) prepared == raw outputs
bit-for-bit for every kind, (b) the decode heuristics never pick an
N block that forces a per-call weight pad on lane-aligned N.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.indexing import snap_divisor_bn
from composable_kernel_tpu.ops.quant import (
    dequant_gemm,
    prepare_w4a8,
    prepare_w8a8,
    prepare_wo_quant,
    quantize_act_token,
    w4a8_gemm,
    w8a8_gemm,
    wo_quant_gemm,
)
from composable_kernel_tpu.reference import quant as rq

KEYS = jax.random.split(jax.random.PRNGKey(11), 4)


def _setup(m, n, k, g):
    a = jax.random.normal(KEYS[0], (m, k), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(KEYS[1], (k, n), jnp.float32) * 0.1
    w_q, w_s = rq.ref_quantize_group(w, group_size=g, bits=4)
    return a, w_q, w_s


class TestSnapDivisorBn:
    def test_known_shapes(self):
        # N=11008: 3712 pads to 11136 -> snap up to the dividing 5504
        assert snap_divisor_bn(11008, 3712) == 5504
        assert snap_divisor_bn(14336, 3584) == 3584  # already divides
        assert snap_divisor_bn(28672, 4096) == 4096
        # unaligned N: unchanged (prepare pads once instead)
        assert snap_divisor_bn(11111, 3712) == 3712

    def test_divides_when_aligned(self):
        for n in (4096, 5120, 11008, 14336, 22016, 28672, 32000):
            for target in (512, 1024, 3584, 3712, 7168):
                bn = snap_divisor_bn(n, target)
                if n % 128 == 0 and target < n:
                    assert n % bn == 0 or bn == target, (n, target, bn)


class TestPreparedW4A8:
    @pytest.mark.parametrize("m", [1, 8, 384])
    def test_bit_parity(self, m):
        n, k, g = 384, 512, 128
        a, w_q, w_s = _setup(m, n, k, g)
        packed = dtypes.pack_int4_w4a8(w_q)
        prep = prepare_w4a8(packed, w_s, group_size=g)
        a_q, a_s = quantize_act_token(a)
        want = w4a8_gemm(a_q, a_s, packed, w_s, group_size=g)
        got = w4a8_gemm(a_q, a_s, prep)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # fused act-quant through the prepared path
        got_f = w4a8_gemm(a, None, prep)
        np.testing.assert_array_equal(np.asarray(got_f), np.asarray(want))

    def test_odd_n_pads_once(self):
        m, n, k, g = 8, 300, 512, 128
        a, w_q, w_s = _setup(m, n, k, g)
        packed = dtypes.pack_int4_w4a8(w_q)
        prep = prepare_w4a8(packed, w_s, group_size=g)
        assert prep.np_ % prep.bn == 0
        a_q, a_s = quantize_act_token(a)
        want = w4a8_gemm(a_q, a_s, packed, w_s, group_size=g)
        got = w4a8_gemm(a_q, a_s, prep)
        assert got.shape == want.shape == (m, n)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_scan_jit_pytree(self):
        """Prepared weights must flow through jit/scan as a pytree."""
        n, k, g = 384, 512, 128
        a, w_q, w_s = _setup(8, n, k, g)
        prep = prepare_w4a8(dtypes.pack_int4_w4a8(w_q), w_s, group_size=g)

        @jax.jit
        def f(prep, a):
            def body(c, _):
                o = w4a8_gemm(c, None, prep)
                return c + (o[:1, :1] * 1e-30).astype(c.dtype), o

            _, os_ = jax.lax.scan(body, a, None, length=2)
            return os_

        out = f(prep, a)
        assert out.shape == (2, 8, n)
        a_q, a_s = quantize_act_token(a)
        want = w4a8_gemm(a_q, a_s, dtypes.pack_int4_w4a8(w_q), w_s,
                         group_size=g)
        np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(want))


class TestPreparedW8A8:
    @pytest.mark.parametrize("m", [1, 8, 384])
    def test_bit_parity(self, m):
        n, k = 384, 512
        a = jax.random.normal(KEYS[0], (m, k), jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(KEYS[1], (k, n), jnp.float32) * 0.1
        w_q, w_s = rq.ref_quantize_per_channel(w, bits=8)
        prep = prepare_w8a8(w_q, w_s)
        a_q, a_s = quantize_act_token(a)
        want = w8a8_gemm(a_q, a_s, w_q, w_s)
        got = w8a8_gemm(a_q, a_s, prep)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_odd_n_pads_once(self):
        """Vocab-like N that no decode block divides: prepared output must
        slice back to the true N and match the raw path bit-for-bit."""
        m, n, k = 8, 300, 512
        a = jax.random.normal(KEYS[2], (m, k), jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(KEYS[3], (k, n), jnp.float32) * 0.1
        w_q, w_s = rq.ref_quantize_per_channel(w, bits=8)
        prep = prepare_w8a8(w_q, w_s)
        assert prep.np_ % prep.bn == 0
        a_q, a_s = quantize_act_token(a)
        want = w8a8_gemm(a_q, a_s, w_q, w_s)
        got = w8a8_gemm(a_q, a_s, prep)
        assert got.shape == want.shape == (m, n)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestPreparedWoQuant:
    @pytest.mark.parametrize("m", [1, 8, 384])
    def test_w4a16_bit_parity(self, m):
        n, k, g = 384, 512, 128
        a, w_q, w_s = _setup(m, n, k, g)
        p16 = dtypes.pack_int4(w_q)
        prep = prepare_wo_quant(p16, w_s, group_size=g, packed_int4=True)
        want = dequant_gemm(a, p16, w_s, group_size=g, packed_int4=True)
        got = dequant_gemm(a, prep)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        got2 = wo_quant_gemm(a, prep)
        np.testing.assert_array_equal(np.asarray(got2), np.asarray(want))

    def test_w8a16_per_channel(self):
        m, n, k = 8, 384, 512
        a = jax.random.normal(KEYS[2], (m, k), jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(KEYS[3], (k, n), jnp.float32) * 0.1
        w_q, w_s = rq.ref_quantize_per_channel(w, bits=8)
        prep = prepare_wo_quant(w_q, w_s)
        want = dequant_gemm(a, w_q, w_s)
        got = dequant_gemm(a, prep)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_w8a16_group(self):
        m, n, k, g = 8, 384, 512, 128
        a = jax.random.normal(KEYS[2], (m, k), jnp.float32).astype(jnp.bfloat16)
        w = jax.random.normal(KEYS[3], (k, n), jnp.float32) * 0.1
        w_q, w_s = rq.ref_quantize_group(w, group_size=g, bits=8)
        prep = prepare_wo_quant(w_q, w_s, group_size=g)
        want = dequant_gemm(a, w_q, w_s, group_size=g)
        got = dequant_gemm(a, prep)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
