"""S0 substrate tests: dtypes, int4 packing, check_err, references.

Modeled on CK's infrastructure unit tests (test/data_type/,
test/magic_number_division/ — SURVEY.md §4 pattern 4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.ops import epilogues as ep
from composable_kernel_tpu.reference import (
    ref_attention,
    ref_conv_fwd,
    ref_dequant_gemm,
    ref_gemm,
    ref_int8_gemm_requant,
    ref_layernorm,
    ref_pool,
    ref_quantize_group,
    ref_quantize_per_channel,
    ref_reduce,
    ref_rmsnorm,
    ref_softmax,
)
from composable_kernel_tpu.utils import check_err, make_tensor


def test_int4_pack_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randint(-8, 8, size=(64, 32)).astype(np.int8)
    packed = dtypes.pack_int4(jnp.asarray(w), axis=0)
    assert packed.shape == (32, 32)
    un = np.asarray(dtypes.unpack_int4(packed, axis=0))
    np.testing.assert_array_equal(un, w)
    un_np = dtypes.unpack_int4_np(np.asarray(packed), axis=0)
    np.testing.assert_array_equal(un_np, w)


def test_int4_pack_axis1():
    rng = np.random.RandomState(1)
    w = rng.randint(-8, 8, size=(8, 64)).astype(np.int8)
    packed = dtypes.pack_int4(jnp.asarray(w), axis=1)
    un = np.asarray(dtypes.unpack_int4(packed, axis=1))
    np.testing.assert_array_equal(un, w)


def test_check_err_float_pass_fail():
    x = np.ones((4, 4), np.float32)
    check_err(x, x + 1e-7)
    with pytest.raises(AssertionError):
        check_err(x, x + 1.0)


def test_check_err_int_exact():
    x = np.arange(16, dtype=np.int32).reshape(4, 4)
    check_err(x, x.copy())
    y = x.copy()
    y[0, 0] += 1
    with pytest.raises(AssertionError):
        check_err(x, y)


def test_ref_gemm_matches_numpy():
    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    a = make_tensor(k0, (32, 48), jnp.float32)
    b = make_tensor(k1, (48, 24), jnp.float32)
    out = ref_gemm(a, b)
    check_err(out, np.asarray(a) @ np.asarray(b))


def test_ref_gemm_epilogue_add_add_fastgelu():
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 4)
    a = make_tensor(k0, (16, 32), jnp.float32)
    b = make_tensor(k1, (32, 8), jnp.float32)
    d0 = make_tensor(k2, (16, 8), jnp.float32)
    d1 = make_tensor(k3, (16, 8), jnp.float32)
    out = ref_gemm(a, b, ds=(d0, d1), c_op=ep.add_add_fast_gelu)
    acc = np.asarray(a) @ np.asarray(b) + np.asarray(d0) + np.asarray(d1)
    expect = 0.5 * acc * (1 + np.tanh(0.7978845608028654 * (acc + 0.044715 * acc**3)))
    check_err(out, expect, rtol=1e-4, atol=1e-5)


def test_ref_dequant_gemm_per_channel_exact():
    # Integer-valued inputs -> result must be exactly representable.
    k0 = jax.random.PRNGKey(2)
    a = make_tensor(k0, (8, 16), jnp.float32, kind="int")
    w_q = make_tensor(jax.random.PRNGKey(3), (16, 12), jnp.int8)
    scales = jnp.full((12,), 0.5, jnp.float32)
    out = ref_dequant_gemm(a, w_q, scales)
    expect = np.asarray(a) @ (np.asarray(w_q, np.float32) * 0.5)
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_ref_dequant_gemm_group_int4():
    g = 8
    k, n, m = 32, 8, 4
    rng = np.random.RandomState(7)
    w = rng.randint(-8, 8, size=(k, n)).astype(np.int8)
    scales = rng.uniform(0.1, 1.0, size=(k // g, n)).astype(np.float32)
    a = rng.randint(-3, 4, size=(m, k)).astype(np.float32)
    packed = dtypes.pack_int4(jnp.asarray(w), axis=0)
    out = ref_dequant_gemm(
        jnp.asarray(a), packed, jnp.asarray(scales), group_size=g, packed_int4=True
    )
    w_deq = w.astype(np.float32).reshape(k // g, g, n) * scales[:, None, :]
    expect = a @ w_deq.reshape(k, n)
    check_err(out, expect)


def test_ref_int8_requant():
    rng = np.random.RandomState(9)
    a = rng.randint(-5, 6, size=(8, 16)).astype(np.int8)
    b = rng.randint(-5, 6, size=(16, 8)).astype(np.int8)
    op = ep.activation_mul_clamp(ep.relu, 0.02)
    out = ref_int8_gemm_requant(jnp.asarray(a), jnp.asarray(b), op)
    acc = a.astype(np.int32) @ b.astype(np.int32)
    expect = np.clip(np.round(0.02 * np.maximum(acc, 0)), -128, 127).astype(np.int8)
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_quantizers_roundtrip_accuracy():
    k0 = jax.random.PRNGKey(4)
    w = make_tensor(k0, (256, 64), jnp.float32)
    w_q, s = ref_quantize_per_channel(w)
    deq = np.asarray(w_q, np.float32) * np.asarray(s)[None, :]
    assert np.abs(deq - np.asarray(w)).max() < np.asarray(s).max()

    w_q4, s4 = ref_quantize_group(w, group_size=128, bits=4)
    assert np.asarray(w_q4).min() >= -8 and np.asarray(w_q4).max() <= 7
    deq4 = np.asarray(w_q4, np.float32).reshape(2, 128, 64) * np.asarray(s4)[:, None, :]
    assert np.abs(deq4.reshape(256, 64) - np.asarray(w)).max() < np.asarray(s4).max()


def test_ref_attention_causal_gqa():
    k0, k1, k2 = jax.random.split(jax.random.PRNGKey(5), 3)
    b, hq, hkv, s, d = 2, 4, 2, 16, 8
    q = make_tensor(k0, (b, hq, s, d), jnp.float32)
    k = make_tensor(k1, (b, hkv, s, d), jnp.float32)
    v = make_tensor(k2, (b, hkv, s, d), jnp.float32)
    out = ref_attention(q, k, v, causal=True)
    # row 0 with causal mask attends only key 0 -> out = v[0]
    np.testing.assert_allclose(
        np.asarray(out)[:, ::2, 0, :], np.asarray(v)[:, :, 0, :], rtol=1e-5
    )
    assert out.shape == (b, hq, s, d)


def test_ref_softmax_layernorm_rmsnorm():
    x = make_tensor(jax.random.PRNGKey(6), (4, 32), jnp.float32)
    sm = ref_softmax(x)
    np.testing.assert_allclose(np.asarray(sm).sum(-1), 1.0, rtol=1e-5)

    gamma = jnp.ones((32,))
    beta = jnp.zeros((32,))
    y, mean, inv_std = ref_layernorm(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(y).mean(-1), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(y).std(-1), 1.0, rtol=1e-3)

    yr = ref_rmsnorm(x, gamma)
    ms = (np.asarray(x) ** 2).mean(-1)
    np.testing.assert_allclose(
        np.asarray(yr), np.asarray(x) / np.sqrt(ms + 1e-6)[:, None], rtol=1e-5
    )


def test_ref_conv_and_pool():
    x = make_tensor(jax.random.PRNGKey(7), (1, 8, 8, 4), jnp.float32)
    w = make_tensor(jax.random.PRNGKey(8), (3, 3, 4, 6), jnp.float32)
    out = ref_conv_fwd(x, w, stride=(1, 1), padding=(1, 1))
    assert out.shape == (1, 8, 8, 6)
    p = ref_pool(x, window=(2, 2), mode="max")
    assert p.shape == (1, 4, 4, 4)
    np.testing.assert_array_equal(
        np.asarray(p)[0, 0, 0], np.asarray(x)[0, :2, :2].max((0, 1))
    )


def test_ref_reduce_ops():
    x = make_tensor(jax.random.PRNGKey(9), (8, 16), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ref_reduce(x, 1, "add")), np.asarray(x).sum(1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ref_reduce(x, 0, "amax")), np.abs(np.asarray(x)).max(0), rtol=1e-6
    )


class TestStochasticRounding:
    """CK type_convert SR parity (element_wise_operation.hpp SR variants):
    unbiasedness, exact pass-through, determinism, saturation."""

    def test_int_unbiased_and_bounded(self):
        import jax

        x = jnp.asarray([0.25, -1.75, 3.5, 100.2], jnp.float32)
        keys = jax.random.split(jax.random.PRNGKey(0), 2000)
        from composable_kernel_tpu.dtypes import round_stochastic_int

        samples = jnp.stack([
            round_stochastic_int(x, k).astype(jnp.float32) for k in keys[:400]
        ])
        mean = np.asarray(samples.mean(axis=0))
        np.testing.assert_allclose(mean, np.asarray(x), atol=0.08)
        # every draw lands on one of the two neighbors
        lo = np.floor(np.asarray(x)); hi = lo + 1
        s = np.asarray(samples)
        assert ((s == lo) | (s == hi)).all()

    def test_int_saturates(self):
        import jax

        from composable_kernel_tpu.dtypes import round_stochastic_int

        x = jnp.asarray([300.0, -300.0], jnp.float32)
        out = round_stochastic_int(x, jax.random.PRNGKey(1))
        assert list(np.asarray(out)) == [127, -128]

    def test_bf16_unbiased(self):
        import jax

        from composable_kernel_tpu.dtypes import convert_stochastic

        # x exactly between two bf16 neighbors: RNE always picks the even
        # one; SR must average to x
        lo = jnp.asarray(1.0, jnp.bfloat16)
        hi = jnp.nextafter(jnp.asarray(1.0, jnp.bfloat16),
                           jnp.asarray(2.0, jnp.bfloat16))
        x = (lo.astype(jnp.float32) + hi.astype(jnp.float32)) / 2.0
        keys = jax.random.split(jax.random.PRNGKey(2), 800)
        xs = jnp.broadcast_to(x, (800,))
        out = jnp.stack([
            convert_stochastic(xs[i : i + 1], keys[i])[0] for i in range(0, 800, 50)
        ])
        # both neighbors appear across keys
        vals = set(np.asarray(out.astype(jnp.float32)).tolist())
        assert len(vals) == 2, vals
        big = jnp.broadcast_to(x, (4096,))
        draw = convert_stochastic(big, jax.random.PRNGKey(3)).astype(jnp.float32)
        np.testing.assert_allclose(
            float(draw.mean()), float(x), rtol=5e-4
        )

    def test_bf16_exact_passthrough_and_nonfinite(self):
        import jax

        from composable_kernel_tpu.dtypes import convert_stochastic

        x = jnp.asarray([0.5, -2.0, 1024.0, np.inf, -np.inf, np.nan],
                        jnp.float32)
        out = convert_stochastic(x, jax.random.PRNGKey(4))
        f = np.asarray(out.astype(jnp.float32))
        assert f[0] == 0.5 and f[1] == -2.0 and f[2] == 1024.0
        assert np.isposinf(f[3]) and np.isneginf(f[4]) and np.isnan(f[5])

    def test_deterministic_per_key(self):
        import jax

        from composable_kernel_tpu.dtypes import round_stochastic_int

        x = jax.random.normal(jax.random.PRNGKey(5), (64,), jnp.float32) * 10
        a = round_stochastic_int(x, jax.random.PRNGKey(6))
        b = round_stochastic_int(x, jax.random.PRNGKey(6))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
