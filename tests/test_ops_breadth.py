"""S6 breadth tests: softmax/norm kernels, reduce, conv, pool, contraction,
tensor ops, embedding, fused GEMM variants.

Host-reference comparison per SURVEY.md §4; references from
composable_kernel_tpu.reference (CK reference_tensor_operation parity).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.ops import epilogues as ep
from composable_kernel_tpu.ops import normalization as norm
from composable_kernel_tpu.ops import pool as pool_ops
from composable_kernel_tpu.ops import reduction as red
from composable_kernel_tpu.ops import tensor_ops as tops
from composable_kernel_tpu.ops.contraction import batched_contraction, cgemm, contraction
from composable_kernel_tpu.ops.conv import (
    conv_bwd_data,
    conv_bwd_weight,
    conv_fwd,
    conv_int8,
    conv_wo_quant,
)
from composable_kernel_tpu.ops.embedding import sparse_embedding_layernorm
from composable_kernel_tpu.ops.gemm.api import (
    batched_gemm_gemm,
    gemm_layernorm,
    gemm_reduce,
)
from composable_kernel_tpu.reference import normalization as rnorm
from composable_kernel_tpu.utils.check_err import check_err

KEYS = jax.random.split(jax.random.PRNGKey(3), 10)


def _rand(i, shape, dtype=jnp.float32):
    return jax.random.normal(KEYS[i], shape, jnp.float32).astype(dtype)


class TestSoftmaxKernel:
    @pytest.mark.parametrize("shape", [(64, 256), (3, 17, 100), (128, 1000)])
    def test_softmax(self, shape):
        x = _rand(0, shape)
        check_err(norm.softmax(x), rnorm.ref_softmax(x))

    def test_alpha_beta_prior(self):
        x = _rand(0, (32, 128))
        prior = _rand(1, (32, 128))
        got = norm.softmax(x, alpha=2.0, beta=0.5, prior=prior)
        want = rnorm.ref_softmax(x, alpha=2.0, beta=0.5, prior=prior)
        check_err(got, want)


class TestNormKernels:
    @pytest.mark.parametrize("n", [256, 100, 1024])
    def test_layernorm(self, n):
        x = _rand(0, (64, n))
        g, b = _rand(1, (n,)), _rand(2, (n,))
        got = norm.layernorm(x, g, b)
        want, _, _ = rnorm.ref_layernorm(x, g, b)
        check_err(got, want, rtol=1e-4, atol=1e-4)

    def test_layernorm_stats_and_preadd(self):
        x, r = _rand(0, (32, 256)), _rand(3, (32, 256))
        g, b = _rand(1, (256,)), _rand(2, (256,))
        got, mean, inv = norm.layernorm(x, g, b, pre_add=r, save_stats=True)
        want, wmean, winv = rnorm.ref_layernorm(x, g, b, pre_add=r)
        check_err(got, want, rtol=1e-4, atol=1e-4)
        check_err(mean, wmean[..., 0], rtol=1e-4, atol=1e-5)
        check_err(inv, winv[..., 0], rtol=1e-3, atol=1e-4)

    def test_rmsnorm(self):
        x, g = _rand(0, (64, 512), jnp.bfloat16), _rand(1, (512,))
        got = norm.rmsnorm(x, g)
        want = rnorm.ref_rmsnorm(x, g)
        check_err(got, want, rtol=2e-2, atol=2e-2)

    def test_groupnorm(self):
        x = _rand(0, (2, 8, 8, 32))
        g, b = _rand(1, (32,)), _rand(2, (32,))
        got = norm.groupnorm(x, g, b, num_groups=4)
        want = rnorm.ref_groupnorm(x, g, b, num_groups=4)
        check_err(got, want, rtol=1e-3, atol=1e-3)

    def test_batchnorm_infer(self):
        x = _rand(0, (2, 8, 8, 16))
        g, b = _rand(1, (16,)), _rand(2, (16,))
        m, v = _rand(3, (16,)), jnp.abs(_rand(4, (16,))) + 0.5
        got = norm.batchnorm_infer(x, g, b, m, v)
        want = rnorm.ref_batchnorm_infer(x, g, b, m, v)
        check_err(got, want, rtol=1e-4, atol=1e-4)


class TestReduce:
    def test_ops(self):
        x = _rand(0, (16, 64, 8))
        for op, npf in [
            ("add", np.sum), ("max", np.max), ("min", np.min),
            ("avg", np.mean),
            ("amax", lambda a, axis: np.max(np.abs(a), axis=axis)),
            ("norm2", lambda a, axis: np.sqrt(np.sum(a * a, axis=axis))),
        ]:
            got = red.reduce(x, (1,), op)
            want = npf(np.asarray(x, np.float64), axis=1)
            check_err(got, want, rtol=1e-4, atol=1e-4)

    def test_in_out_ops_multiple(self):
        x = _rand(0, (8, 32))
        got = red.reduce(x, (1,), "add", in_op=lambda v: v * v,
                         out_op=jnp.sqrt)
        want = np.sqrt(np.sum(np.asarray(x, np.float64) ** 2, axis=1))
        check_err(got, want, rtol=1e-4, atol=1e-4)
        s, m = red.multiple_reduce(x, (1,), ("add", "max"))
        check_err(s, np.asarray(x, np.float64).sum(1), rtol=1e-4, atol=1e-4)


class TestConv:
    def test_conv2d_fwd_vs_reference(self):
        from composable_kernel_tpu.reference.conv import ref_conv_fwd

        x = _rand(0, (2, 8, 8, 16))
        w = _rand(1, (3, 3, 16, 32))
        got = conv_fwd(x, w, padding=((1, 1), (1, 1)))
        want = ref_conv_fwd(x, w, stride=(1, 1), padding=(1, 1))
        check_err(got, want, rtol=1e-3, atol=1e-3)

    def test_conv1d_3d(self):
        x1, w1 = _rand(0, (2, 16, 8)), _rand(1, (3, 8, 8))
        assert conv_fwd(x1, w1).shape == (2, 14, 8)
        x3, w3 = _rand(2, (1, 4, 6, 6, 4)), _rand(3, (2, 3, 3, 4, 8))
        assert conv_fwd(x3, w3).shape == (1, 3, 4, 4, 8)

    def test_grouped_conv(self):
        x = _rand(0, (2, 8, 8, 16))
        w = _rand(1, (3, 3, 4, 32))  # groups=4: C/g = 4
        got = conv_fwd(x, w, groups=4)
        # reference: blockwise group conv
        want = jnp.concatenate(
            [
                conv_fwd(x[..., 4 * i : 4 * (i + 1)], w[..., 8 * i : 8 * (i + 1)])
                for i in range(4)
            ],
            axis=-1,
        )
        check_err(got, want, rtol=1e-4, atol=1e-4)

    def test_conv_bias_relu_epilogue(self):
        x, w = _rand(0, (2, 8, 8, 8)), _rand(1, (3, 3, 8, 16))
        bias = _rand(2, (16,))
        got = conv_fwd(x, w, ds=(bias,), c_op=ep.add_relu)
        want = jnp.maximum(conv_fwd(x, w) + bias, 0.0)
        check_err(got, want, rtol=1e-4, atol=1e-4)

    def test_conv_int8_exact(self):
        x = jnp.asarray(np.random.randint(-64, 64, (1, 8, 8, 8)), jnp.int8)
        w = jnp.asarray(np.random.randint(-64, 64, (3, 3, 8, 16)), jnp.int8)
        op = ep.activation_mul_clamp(ep.relu, 0.01)
        got = conv_int8(x, w, op)
        acc = conv_fwd(x.astype(jnp.int32), w.astype(jnp.int32),
                       acc_dtype=jnp.int32, out_dtype=jnp.int32)
        want = jnp.clip(jnp.round(0.01 * jnp.maximum(acc.astype(jnp.float32), 0)),
                        -128, 127).astype(jnp.int8)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_conv_wo_quant(self):
        x = _rand(0, (1, 8, 8, 8), jnp.bfloat16)
        w = jnp.asarray(np.random.randint(-127, 128, (3, 3, 8, 16)), jnp.int8)
        s = jnp.abs(_rand(1, (16,))) * 0.01 + 1e-4
        got = conv_wo_quant(x, w, s)
        want = conv_fwd(x, (w.astype(jnp.float32) * s).astype(jnp.bfloat16))
        check_err(got, want, rtol=2e-2, atol=2e-2)

    def test_conv_bwd_data_weight(self):
        x, w = _rand(0, (2, 8, 8, 4)), _rand(1, (3, 3, 4, 8))

        def f(x_, w_):
            return conv_fwd(x_, w_, padding=((1, 1), (1, 1)))

        dy = _rand(2, f(x, w).shape)
        dx_want, dw_want = jax.vjp(f, x, w)[1](dy)
        dx = conv_bwd_data(dy, w, (8, 8), padding=((1, 1), (1, 1)))
        dw = conv_bwd_weight(x, dy, (3, 3), padding=((1, 1), (1, 1)))
        check_err(dx, dx_want, rtol=1e-3, atol=1e-3)
        check_err(dw, dw_want, rtol=1e-3, atol=1e-3)


class TestPool:
    def test_avg_max(self):
        x = _rand(0, (2, 8, 8, 8))
        got = pool_ops.avg_pool(x, (2, 2))
        want = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 2, 2, 1),
                                     (1, 2, 2, 1), "VALID") / 4.0
        check_err(got, want, rtol=1e-5, atol=1e-5)
        y, idx = pool_ops.max_pool(x, (2, 2), return_indices=True)
        assert (np.asarray(x).reshape(-1)[np.asarray(idx).reshape(-1)]
                == np.asarray(y).reshape(-1)).all()

    def test_pool_bwd(self):
        x = _rand(0, (1, 4, 4, 4))
        y, idx = pool_ops.max_pool(x, (2, 2), return_indices=True)
        dy = _rand(1, y.shape)
        dx = pool_ops.max_pool_bwd(dy, idx, x.shape)
        want = jax.vjp(lambda v: pool_ops.max_pool(v, (2, 2)), x)[1](dy)[0]
        check_err(dx, want, rtol=1e-4, atol=1e-4)
        dxa = pool_ops.avg_pool_bwd(dy, x.shape, (2, 2))
        wanta = jax.vjp(lambda v: pool_ops.avg_pool(v, (2, 2)), x)[1](dy)[0]
        check_err(dxa, wanta, rtol=1e-4, atol=1e-4)


class TestTensorOps:
    def test_permute_elementwise(self):
        x = _rand(0, (4, 8, 16))
        got = tops.permute(x, (2, 0, 1), op=ep.relu)
        check_err(got, jnp.maximum(jnp.transpose(x, (2, 0, 1)), 0))
        y = tops.elementwise(ep.add, x, x)
        check_err(y, 2 * x)

    def test_put_element(self):
        dst = jnp.zeros((4, 4), jnp.float32)
        idx = jnp.asarray([0, 5, 5], jnp.int32)
        vals = jnp.asarray([1.0, 2.0, 3.0])
        got = tops.put_element(dst, idx, vals, mode="add")
        assert got[0, 0] == 1.0 and got[1, 1] == 5.0

    def test_im2col_col2im(self):
        x = _rand(0, (2, 6, 6, 4))
        cols = tops.image_to_column(x, (3, 3), pads=((1, 1), (1, 1)))
        assert cols.shape == (2 * 6 * 6, 9 * 4)
        # explicit-GEMM conv == native conv
        w = _rand(1, (3, 3, 4, 8))
        got = (cols @ w.reshape(9 * 4, 8)).reshape(2, 6, 6, 8)
        want = conv_fwd(x, w, padding=((1, 1), (1, 1)))
        check_err(got, want, rtol=1e-3, atol=1e-3)
        # col2im round trip via overlap-add of ones-filter
        img = tops.column_to_image(cols, x.shape, (3, 3), pads=((1, 1), (1, 1)))
        assert img.shape == x.shape

    def test_im2col_strided_dilated(self):
        x = _rand(0, (1, 9, 9, 2))
        w = _rand(1, (3, 3, 2, 4))
        cols = tops.image_to_column(x, (3, 3), strides=(2, 2), dilations=(2, 2))
        out_sp = (9 - 5) // 2 + 1
        got = (cols @ w.reshape(18, 4)).reshape(1, out_sp, out_sp, 4)
        want = conv_fwd(x, w, strides=(2, 2), dilations=(2, 2))
        check_err(got, want, rtol=1e-3, atol=1e-3)


class TestContraction:
    def test_contraction_2m2n2k(self):
        a = _rand(0, (4, 6, 8, 3))  # M=(4,6), K=(8,3)
        b = _rand(1, (8, 3, 5, 7))  # K=(8,3), N=(5,7)
        got = contraction(a, b, dims_m=(0, 1), dims_n=(2, 3),
                          dims_k=((2, 0), (3, 1)))
        want = jnp.einsum("mnkl,klpq->mnpq", a, b)
        check_err(got, want, rtol=1e-3, atol=1e-3)

    def test_batched(self):
        a = _rand(0, (3, 4, 8))
        b = _rand(1, (3, 8, 5))
        got = batched_contraction(a, b, dims_m=(0,), dims_n=(1,),
                                  dims_k=((1, 0),))
        want = jnp.einsum("gmk,gkn->gmn", a, b)
        check_err(got, want, rtol=1e-3, atol=1e-3)

    def test_cgemm(self):
        ar, ai = _rand(0, (32, 64)), _rand(1, (32, 64))
        br, bi = _rand(2, (64, 48)), _rand(3, (64, 48))
        cr, ci = cgemm(ar, ai, br, bi)
        want = (ar + 1j * ai).astype(jnp.complex64) @ (br + 1j * bi).astype(
            jnp.complex64
        )
        check_err(cr, want.real, rtol=1e-3, atol=1e-3)
        check_err(ci, want.imag, rtol=1e-3, atol=1e-3)


class TestFusedGemmVariants:
    def test_gemm_reduce(self):
        a, b = _rand(0, (32, 64), jnp.bfloat16), _rand(1, (64, 48), jnp.bfloat16)
        e, (rsum, rmax) = gemm_reduce(a, b, reduce_ops=("add", "max"))
        ef = np.asarray(e, np.float64)
        check_err(rsum, ef.sum(1), rtol=1e-2, atol=1e-2)
        check_err(rmax, ef.max(1), rtol=1e-2, atol=1e-2)

    def test_gemm_layernorm(self):
        a, b = _rand(0, (32, 64), jnp.bfloat16), _rand(1, (64, 128), jnp.bfloat16)
        g, be = _rand(2, (128,)), _rand(3, (128,))
        got = gemm_layernorm(a, b, g, be)
        e = jnp.matmul(a.astype(jnp.float32), b.astype(jnp.float32))
        want, _, _ = rnorm.ref_layernorm(e, g, be)
        check_err(got, want, rtol=3e-2, atol=3e-2)

    def test_batched_gemm_gemm(self):
        a = _rand(0, (2, 16, 32), jnp.bfloat16)
        b0 = _rand(1, (2, 32, 64), jnp.bfloat16)
        b1 = _rand(2, (2, 64, 24), jnp.bfloat16)
        got = batched_gemm_gemm(a, b0, b1, acc_op=ep.relu)
        want = jnp.einsum(
            "gmn,gno->gmo",
            jnp.maximum(jnp.einsum("gmk,gkn->gmn", a.astype(jnp.float32),
                                   b0.astype(jnp.float32)), 0).astype(jnp.bfloat16).astype(jnp.float32),
            b1.astype(jnp.float32),
        )
        check_err(got, want, rtol=3e-2, atol=3e-2)


class TestEmbedding:
    def test_sparse_embedding_layernorm(self):
        tables = [_rand(i, (100, 64)) for i in range(3)]
        idx = [
            jax.random.randint(KEYS[5 + i], (16,), 0, 100) for i in range(3)
        ]
        g, b = _rand(8, (64,)), _rand(9, (64,))
        got = sparse_embedding_layernorm(tables, idx, g, b)
        acc = sum(jnp.take(t, i, axis=0) for t, i in zip(tables, idx))
        want, _, _ = rnorm.ref_layernorm(acc, g, b, eps=1e-4)
        check_err(got, want, rtol=1e-3, atol=1e-3)


class TestRobustness:
    def test_norm_big_row_fallback(self):
        # rows beyond the VMEM budget take the XLA path transparently
        x = _rand(0, (4, 40000))
        g, b = jnp.ones((40000,)), jnp.zeros((40000,))
        got = norm.layernorm(x, g, b)
        want, _, _ = rnorm.ref_layernorm(x, g, b)
        check_err(got, want, rtol=1e-4, atol=1e-4)
        got = norm.softmax(x)
        check_err(got, rnorm.ref_softmax(x), rtol=1e-4, atol=1e-5)

    def test_grouped_conv_bwd(self):
        from composable_kernel_tpu.ops.conv import conv_bwd_data, conv_bwd_weight

        x, w = _rand(0, (2, 8, 8, 8)), _rand(1, (3, 3, 2, 8))  # groups=4

        def f(x_, w_):
            return conv_fwd(x_, w_, padding=((1, 1), (1, 1)), groups=4)

        dy = _rand(2, f(x, w).shape)
        dx_want, dw_want = jax.vjp(f, x, w)[1](dy)
        dx = conv_bwd_data(dy, w, (8, 8), padding=((1, 1), (1, 1)), groups=4)
        dw = conv_bwd_weight(x, dy, (3, 3), padding=((1, 1), (1, 1)), groups=4)
        check_err(dx, dx_want, rtol=1e-3, atol=1e-3)
        check_err(dw, dw_want, rtol=1e-3, atol=1e-3)

    def test_batched_gemm_e_permute(self):
        from composable_kernel_tpu.ops.gemm.api import batched_gemm_e_permute

        a = _rand(0, (3, 32, 64), jnp.bfloat16)
        b = _rand(1, (3, 64, 48), jnp.bfloat16)
        got = batched_gemm_e_permute(a, b, (1, 0, 2))
        want = jnp.transpose(
            jnp.einsum("gmk,gkn->gmn", a.astype(jnp.float32),
                       b.astype(jnp.float32)), (1, 0, 2)
        )
        check_err(got, want, rtol=2e-2, atol=2e-2)


def test_conv_wo_quant_gemm_in_kernel_dequant():
    """Explicit-GEMM quant conv (im2col + in-VMEM dequant) == HBM-dequant conv."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from composable_kernel_tpu import dtypes
    from composable_kernel_tpu.ops.conv import conv_wo_quant, conv_wo_quant_gemm
    from composable_kernel_tpu.reference.quant import (
        ref_quantize_group,
        ref_quantize_per_channel,
    )
    from composable_kernel_tpu.utils.check_err import check_err

    n, h, w_sp, c, k = 2, 10, 10, 32, 64
    fh = fw = 3
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w_sp, c), jnp.float32).astype(jnp.bfloat16)
    filt = jax.random.normal(jax.random.PRNGKey(1), (fh, fw, c, k), jnp.float32)

    # int8 per-channel
    wq8, s8 = ref_quantize_per_channel(filt.reshape(-1, k), bits=8)
    got = conv_wo_quant_gemm(
        x, wq8, s8, filter_shape=(fh, fw), strides=(1, 1),
        padding=((1, 1), (1, 1)),
    )
    want = conv_wo_quant(
        x, wq8.reshape(fh, fw, c, k),
        s8, strides=(1, 1), padding=((1, 1), (1, 1)),
    )
    assert got.shape == want.shape == (n, h, w_sp, k)
    # outputs are 288-term sums (std ~17): atol scales with that
    check_err(got, want, rtol=5e-2, atol=0.5)

    # packed int4 group-wise via the pack-aligned filter quantizer
    from composable_kernel_tpu.ops.conv import conv_fwd, quantize_conv_filter

    g = 128
    packed, s4 = quantize_conv_filter(filt, group_size=g, bits=4)
    got4 = conv_wo_quant_gemm(
        x, packed, s4, filter_shape=(fh, fw), group_size=g, packed_int4=True,
        padding=((1, 1), (1, 1)),
    )
    wq4 = dtypes.unpack_int4(packed, axis=0)
    deq = (wq4.astype(jnp.float32)
           * jnp.repeat(s4, g, axis=0))[: fh * fw * c].reshape(fh, fw, c, k)
    want4 = conv_fwd(x, deq.astype(x.dtype), padding=((1, 1), (1, 1)))
    check_err(got4, want4, rtol=5e-2, atol=0.5)


def test_conv_w4a8_gemm():
    """Fully-quantized W4A8 conv (per-patch int8 acts + int4 filter on the
    int8 MXU) tracks the W4A16 explicit-GEMM conv."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from composable_kernel_tpu.ops.conv import (
        conv_w4a8_gemm,
        conv_wo_quant_gemm,
        quantize_conv_filter,
    )

    n, h, w_sp, c, k = 2, 8, 8, 32, 64
    fh = fw = 3
    g = 128
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w_sp, c), jnp.float32)
    filt = jax.random.normal(jax.random.PRNGKey(1), (fh, fw, c, k), jnp.float32) * 0.1

    pk8, s = quantize_conv_filter(filt, group_size=g, bits=4, pack="w4a8")
    got = conv_w4a8_gemm(
        x, pk8, s, filter_shape=(fh, fw), group_size=g,
        padding=((1, 1), (1, 1)), out_dtype=jnp.float32,
    )
    pk16, s16 = quantize_conv_filter(filt, group_size=g, bits=4)
    want = conv_wo_quant_gemm(
        x.astype(jnp.bfloat16), pk16, s16, filter_shape=(fh, fw),
        group_size=g, packed_int4=True, padding=((1, 1), (1, 1)),
        out_dtype=jnp.float32,
    )
    assert got.shape == want.shape == (n, h, w_sp, k)
    gA, wA = np.asarray(got), np.asarray(want)
    rel = np.linalg.norm(gA - wA) / np.linalg.norm(wA)
    # identical W4 error cancels; the per-patch int8 activation quant and
    # the bf16 activations of the reference both contribute ~1e-2
    assert rel < 0.03, rel


class TestConvLayouts:
    """CK layout-zoo parity (device_operation_instance_factory.hpp:52-96):
    every supported activation/filter layout must reproduce the NHWC path
    bit-for-bit after coordinate restoration."""

    def _base(self):
        x = _rand(0, (2, 8, 8, 16))          # N H W (G*C), G=4, Cg=4
        w = _rand(1, (3, 3, 4, 32))          # HWIO, groups=4, K_total=32
        from composable_kernel_tpu.ops.conv import conv_fwd

        return x, w, conv_fwd(x, w, groups=4)

    def test_nchw_kcyx(self):
        from composable_kernel_tpu.ops.conv import conv_fwd_layout

        x, w, want = self._base()
        x_nchw = x.transpose(0, 3, 1, 2)
        w_kcyx = w.transpose(3, 2, 0, 1)     # HWIO -> KCYX
        got = conv_fwd_layout(x_nchw, w_kcyx, layout="NCHW",
                              filter_layout="KCYX", groups=4)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want.transpose(0, 3, 1, 2))
        )

    def test_kyxc_default(self):
        from composable_kernel_tpu.ops.conv import conv_fwd_layout

        x, w, want = self._base()
        w_kyxc = w.transpose(3, 0, 1, 2)     # HWIO -> KYXC
        got = conv_fwd_layout(x, w_kyxc, layout="NHWC",
                              filter_layout="KYXC", groups=4)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_nhwgc_gkyxc(self):
        from composable_kernel_tpu.ops.conv import conv_fwd_layout

        x, w, want = self._base()
        g, cg, k = 4, 4, 32
        x_g = x.reshape(2, 8, 8, g, cg)
        # HWIO [3,3,4,32] -> GKYXC [4,8,3,3,4] (K_total is group-major)
        w_g = w.reshape(3, 3, cg, g, k // g).transpose(3, 4, 0, 1, 2)
        got = conv_fwd_layout(x_g, w_g, layout="NHWGC",
                              filter_layout="GKYXC")
        assert got.shape == (2, 6, 6, g, k // g)
        np.testing.assert_array_equal(
            np.asarray(got.reshape(2, 6, 6, k)), np.asarray(want)
        )

    def test_ngchw_gkcyx(self):
        from composable_kernel_tpu.ops.conv import conv_fwd_layout

        x, w, want = self._base()
        g, cg, k = 4, 4, 32
        x_g = x.reshape(2, 8, 8, g, cg).transpose(0, 3, 4, 1, 2)  # NGCHW
        w_g = w.reshape(3, 3, cg, g, k // g).transpose(3, 4, 2, 0, 1)  # GKCYX
        got = conv_fwd_layout(x_g, w_g, layout="NGCHW",
                              filter_layout="GKCYX")
        assert got.shape == (2, g, k // g, 6, 6)
        back = got.transpose(0, 3, 4, 1, 2).reshape(2, 6, 6, k)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(want))

    def test_ncw_1d(self):
        from composable_kernel_tpu.ops.conv import conv_fwd, conv_fwd_layout

        x = _rand(0, (2, 16, 8))             # N W C
        w = _rand(1, (3, 8, 8))              # WIO
        want = conv_fwd(x, w)
        got = conv_fwd_layout(x.transpose(0, 2, 1), w.transpose(2, 1, 0),
                              layout="NCW", filter_layout="KCX")
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want.transpose(0, 2, 1))
        )
