"""S1 Pallas GEMM tests vs jnp references.

Modeled on CK's typed/parameterized gemm tests
(test/gemm_universal/test_gemm_universal_xdl.cpp — dtype x layout sweeps with
SmallM {1..6} decode shapes and odd MidLargeM sizes {127, 255, 312, 799}).
Kernels run in Pallas interpret mode on CPU (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.ops import epilogues as ep
from composable_kernel_tpu.ops.gemm import GemmConfig, batched_gemm, gemm, grouped_gemm
from composable_kernel_tpu.reference import ref_gemm
from composable_kernel_tpu.utils import check_err, make_tensor

SMALL_CFG = GemmConfig(block_m=16, block_n=128, block_k=128)


def _mk(m, n, k, dtype=jnp.float32, seed=0):
    k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
    return make_tensor(k0, (m, k), dtype), make_tensor(k1, (k, n), dtype)


@pytest.mark.parametrize("m,n,k", [
    (8, 128, 128),           # single tile
    (128, 256, 256),         # multi-tile
    (127, 255, 129),         # odd sizes -> padding path (CK MNKPadding)
    (1, 128, 256),           # decode M=1
    (3, 384, 128),           # decode small-M odd
    (312, 136, 72),          # CK MidLargeM-style odd shape
])
def test_gemm_shapes_f32(m, n, k):
    a, b = _mk(m, n, k)
    out = gemm(a, b, config=SMALL_CFG)
    # atol loosened vs CK's 3e-6: the K-blocked accumulation order differs
    # from the reference's single fused matmul by a few f32 ulps.
    check_err(out, ref_gemm(a, b), atol=5e-5, msg=f"{m}x{n}x{k}")


def test_gemm_bf16():
    a, b = _mk(64, 128, 128, jnp.bfloat16, seed=1)
    out = gemm(a, b, config=SMALL_CFG)
    check_err(out, ref_gemm(a, b), dtype=jnp.bfloat16)


def test_gemm_int8_acc_int32_exact():
    k0, k1 = jax.random.split(jax.random.PRNGKey(2))
    a = make_tensor(k0, (32, 64), jnp.int8)
    b = make_tensor(k1, (64, 128), jnp.int8)
    out = gemm(a, b, config=SMALL_CFG)
    assert out.dtype == jnp.int32
    expect = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
    np.testing.assert_array_equal(np.asarray(out), expect)


def test_gemm_split_k():
    a, b = _mk(16, 128, 1024, seed=3)
    cfg = GemmConfig(block_m=16, block_n=128, block_k=128, split_k=4)
    out = gemm(a, b, config=cfg)
    check_err(out, ref_gemm(a, b), atol=5e-5)


def test_gemm_split_k_indivisible_rejected():
    """A split_k that does not divide the K-steps must be REJECTED by
    is_supported and raise in the kernel — never silently reset to 1
    (an autotuner must not 'select' a config that never ran as specified)."""
    from composable_kernel_tpu.ops.gemm.config import is_supported

    a, b = _mk(16, 128, 384, seed=3)  # 3 K-steps at block_k=128
    cfg = GemmConfig(block_m=16, block_n=128, block_k=128, split_k=2)
    assert not is_supported(cfg, 16, 128, 384)
    with pytest.raises(ValueError, match="split_k"):
        gemm(a, b, config=cfg)


def test_gemm_epilogue_bias_add_add_fastgelu():
    a, b = _mk(32, 128, 64, seed=4)
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    d0 = make_tensor(keys[0], (32, 128), jnp.float32)
    bias = make_tensor(keys[1], (128,), jnp.float32)
    out = gemm(a, b, ds=(d0, bias), c_op=ep.add_add_fast_gelu, config=SMALL_CFG)
    refout = ref_gemm(a, b, ds=(d0, bias.reshape(1, -1)), c_op=ep.add_add_fast_gelu)
    check_err(out, refout, rtol=1e-4, atol=1e-5)


def test_gemm_epilogue_bilinear_with_splitk():
    a, b = _mk(8, 128, 512, seed=6)
    d0 = make_tensor(jax.random.PRNGKey(7), (8, 128), jnp.float32)
    cfg = GemmConfig(block_m=8, block_n=128, block_k=128, split_k=2)
    out = gemm(a, b, ds=(d0,), c_op=ep.bilinear(0.5, 2.0), config=cfg)
    refout = ref_gemm(a, b, ds=(d0,), c_op=ep.bilinear(0.5, 2.0))
    check_err(out, refout, atol=5e-5)


def test_gemm_ab_elementwise_ops():
    a, b = _mk(16, 128, 64, seed=8)
    out = gemm(a, b, a_op=ep.abs_, b_op=ep.relu, config=SMALL_CFG)
    refout = ref_gemm(a, b, a_op=ep.abs_, b_op=ep.relu)
    check_err(out, refout, atol=5e-5)


def test_batched_gemm():
    k0, k1 = jax.random.split(jax.random.PRNGKey(9))
    a = make_tensor(k0, (4, 32, 64), jnp.float32)
    b = make_tensor(k1, (4, 64, 128), jnp.float32)
    out = batched_gemm(a, b, config=SMALL_CFG)
    expect = np.einsum("gmk,gkn->gmn", np.asarray(a), np.asarray(b))
    check_err(out, expect, atol=5e-5)


def _check_grouped(sizes, g, k, n, cfg, m=None):
    m = sum(sizes) if m is None else m
    keys = jax.random.split(jax.random.PRNGKey(10), 2)
    a = make_tensor(keys[0], (m, k), jnp.float32)
    b = make_tensor(keys[1], (g, k, n), jnp.float32)
    out = grouped_gemm(jnp.asarray(sizes, jnp.int32), a, b, config=cfg)
    offs = np.cumsum([0] + list(sizes))
    for gi in range(g):
        seg = np.asarray(a)[offs[gi]:offs[gi + 1]] @ np.asarray(b)[gi]
        check_err(np.asarray(out)[offs[gi]:offs[gi + 1]], seg, atol=5e-5,
                  msg=f"group {gi}")
    return np.asarray(out), np.asarray(a), np.asarray(b), offs


def test_grouped_gemm_ragged():
    cfg = GemmConfig(block_m=16, block_n=128, block_k=128)
    _check_grouped([32, 16, 48], 3, 64, 128, cfg)


def test_grouped_gemm_arbitrary_sizes():
    # CK fixed-NK contract (device_grouped_gemm_fixed_nk.hpp:56): group
    # sizes need NO tile alignment — tiles straddling boundaries merge via
    # masked row stores.
    cfg = GemmConfig(block_m=16, block_n=128, block_k=128)
    _check_grouped([5, 27, 1, 63], 4, 64, 128, cfg)


def test_grouped_gemm_empty_and_tiny_groups():
    cfg = GemmConfig(block_m=16, block_n=128, block_k=128)
    _check_grouped([0, 7, 0, 3, 29], 5, 64, 128, cfg)


def test_grouped_gemm_trailing_rows_use_last_group():
    cfg = GemmConfig(block_m=16, block_n=128, block_k=128)
    sizes = [10, 20]
    out, a, b, offs = _check_grouped(sizes, 2, 64, 128, cfg, m=48)
    # rows past sum(sizes) compute against the last group
    tail = a[30:] @ b[1]
    check_err(out[30:], tail, atol=5e-5, msg="trailing rows")


def test_gemm_out_dtype_override():
    a, b = _mk(16, 128, 64, seed=11)
    out = gemm(a, b, out_dtype=jnp.bfloat16, config=SMALL_CFG)
    assert out.dtype == jnp.bfloat16
    check_err(out, ref_gemm(a, b), dtype=jnp.bfloat16)


def test_grouped_gemm_wo_quant_int8():
    """Grouped weight-only int8 GEMM: in-kernel dequant, per-channel scales
    (CK client_example/31_grouped_gemm_bf16Aint8B parity)."""
    import numpy as np

    from composable_kernel_tpu.reference.quant import ref_quantize_per_channel

    g_n, k, n = 3, 128, 256
    sizes = [40, 17, 71]
    a = jax.random.normal(jax.random.PRNGKey(0), (sum(sizes), k),
                          jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (g_n, k, n), jnp.float32)
    qs = [ref_quantize_per_channel(w[i], bits=8) for i in range(g_n)]
    b_q = jnp.stack([q for q, _ in qs])
    scales = jnp.stack([s for _, s in qs])
    got = grouped_gemm(jnp.asarray(sizes, jnp.int32), a, b_q, scales=scales)
    lo = 0
    for i, sz in enumerate(sizes):
        deq = np.asarray(b_q[i], np.float64) * np.asarray(scales[i], np.float64)[None, :]
        want = np.asarray(a[lo:lo+sz], np.float64) @ deq
        got_i = np.asarray(got[lo:lo+sz], np.float64)
        err = np.abs(got_i - want).max() / (np.abs(want).max() + 1e-9)
        assert err < 3e-2, (i, err)
        lo += sz


def test_grouped_gemm_w4a8():
    """Grouped W4A8: per-expert int4 on the int8 MXU, arbitrary sizes."""
    import numpy as np

    from composable_kernel_tpu import dtypes
    from composable_kernel_tpu.ops.gemm.ragged import ragged_w4a8_gemm
    from composable_kernel_tpu.ops.quant import quantize_act_token
    from composable_kernel_tpu.reference.quant import (
        ref_quantize_group,
        ref_w4a8_gemm,
    )

    g_n, k, n, gs = 3, 256, 256, 128
    sizes = [40, 17, 71]
    a = jax.random.normal(jax.random.PRNGKey(0), (sum(sizes), k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (g_n, k, n), jnp.float32) * 0.1
    a_q, a_s = quantize_act_token(a)
    qs = [ref_quantize_group(w[i], group_size=gs, bits=4) for i in range(g_n)]
    b_packed = jnp.stack([dtypes.pack_int4_w4a8(q) for q, _ in qs])
    scales = jnp.stack([s for _, s in qs])

    got = ragged_w4a8_gemm(
        jnp.asarray(sizes, jnp.int32), a_q, a_s, b_packed, scales,
        group_size=gs, out_dtype=jnp.float32,
        config=GemmConfig(block_m=32, block_n=128, block_k=256),
    )
    offs = np.cumsum([0] + sizes)
    for i in range(g_n):
        want = ref_w4a8_gemm(
            a_q[offs[i] : offs[i + 1]], a_s[offs[i] : offs[i + 1]],
            qs[i][0], qs[i][1], group_size=gs, out_dtype=jnp.float32,
        )
        check_err(got[offs[i] : offs[i + 1]], want, rtol=1e-4, atol=1e-4,
                  msg=f"group {i}")
