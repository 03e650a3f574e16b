"""Convolution op family (fwd / bwd-data / bwd-weight, grouped, quantized).

CK surface covered (SURVEY.md §2.3):

  - ``device_grouped_conv_fwd_multiple_abd_xdl_cshuffle.hpp`` (+
    ``TransformConvFwdToGemm``, transform_conv_fwd_to_gemm.hpp:23) —
    grouped 1d/2d/3d conv fwd with fused multiple-D epilogue
  - ``device_conv_fwd_bias_activation[_add].hpp`` — bias+activation(+add)
  - int8 quantized conv (example/40_conv2d_quantization: perlayer /
    perchannel requant) and weight-only dequant conv
  - ``device_grouped_conv_bwd_data_multiple_d.hpp`` /
    ``device_grouped_conv_bwd_weight.hpp`` — training-side convs

TPU design stance: CK reduces conv to implicit GEMM because it must feed
MFMA manually. On TPU, ``lax.conv_general_dilated`` *is* the implicit GEMM
— XLA lowers it straight onto the MXU with exactly the coordinate
transforms CK builds by hand (and fuses the epilogue lambdas we apply).
Re-deriving that in Pallas would duplicate the compiler for no perf gain.
The explicit-GEMM route (``image_to_column`` + the Pallas GEMM with its
epilogue/quant machinery) is available for cases that need our in-kernel
dequant path; weight-only quant convs dequantize W (small) and use the
native conv.

Layouts: NHWC activations / HWIO filters (TPU-native; CK's NHWGC/GKYXC
grouped layouts map to ``groups`` + reshapes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "conv_fwd",
    "conv_fwd_layout",
    "conv_bwd_data",
    "conv_bwd_weight",
    "conv_int8",
    "conv_w4a8_gemm",
    "conv_wo_quant",
    "conv_wo_quant_gemm",
    "quantize_conv_filter",
]


def _dim_nums(ndim):
    sp = "DHW"[3 - ndim :] if ndim <= 3 else None
    lhs = "N" + sp + "C"
    rhs = sp + "IO"
    out = "N" + sp + "C"
    return jax.lax.conv_dimension_numbers(
        (1,) * (ndim + 2), (1,) * (ndim + 2), (lhs, rhs, out)
    )


def _norm_args(ndim, strides, dilations, padding):
    strides = strides or (1,) * ndim
    dilations = dilations or (1,) * ndim
    if padding is None:
        padding = ((0, 0),) * ndim
    elif isinstance(padding, str):
        pass  # "SAME"/"VALID"
    return strides, dilations, padding


def conv_fwd(
    x,
    w,
    *,
    strides=None,
    dilations=None,
    padding=None,
    groups: int = 1,
    ds=(),
    c_op=None,
    acc_dtype=jnp.float32,
    out_dtype=None,
):
    """y = c_op(conv(x, w), *ds) — grouped Nd conv fwd with fused epilogue.

    x: [N, *spatial, C]; w: [*filter, C/groups, K]; ds entries broadcast
    against [N, *out_spatial, K] ([K] bias rows supported). Matches CK's
    multiple-ABD conv contract with CDEElementOp applied on the f32/i32
    accumulator.
    """
    ndim = x.ndim - 2
    strides, dilations, padding = _norm_args(ndim, strides, dilations, padding)
    acc = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=strides,
        padding=padding,
        rhs_dilation=dilations,
        dimension_numbers=_dim_nums(ndim),
        feature_group_count=groups,
        preferred_element_type=acc_dtype,
    )
    if c_op is not None:
        acc = c_op(acc, *[jnp.asarray(d, acc_dtype) for d in ds])
    if out_dtype is None:
        out_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else acc_dtype
    return acc.astype(out_dtype)


def _act_to_channels_last(x, layout: str, ndim: int):
    """Normalize a CK activation layout to [N, *spatial, G*C] channels-last.

    Returns (x_nhwc, groups_in_layout, restore) where ``restore`` maps an
    [N, *out_spatial, K_total] result back to the input's layout family
    (CK convention: output layout mirrors the activation layout).
    Supported families, rank-generic (W/HW/DHW spatial):

      NHWC-family  (N *s C)   — TPU-native, identity
      NCHW-family  (N C *s)   — torch default / CK NGCHW with G folded
      NHWGC-family (N *s G C) — CK's grouped channels-last
      NGCHW-family (N G C *s) — CK's grouped channels-first
    """
    sp = "DHW"[3 - ndim:]
    canon = layout.upper().replace(sp, "S")  # e.g. NSC / NCS / NSGC / NGCS
    if canon == "NSC":
        return x, 1, (lambda y: y)
    if canon == "NCS":
        perm = (0, *range(2, 2 + ndim), 1)
        inv = (0, ndim + 1, *range(1, ndim + 1))
        return x.transpose(perm), 1, (lambda y: y.transpose(inv))
    if canon == "NSGC":
        g = x.shape[-2]
        x2 = x.reshape(*x.shape[:-2], x.shape[-2] * x.shape[-1])
        return x2, g, (
            lambda y: y.reshape(*y.shape[:-1], g, y.shape[-1] // g)
        )
    if canon == "NGCS":
        g = x.shape[1]
        perm = (0, *range(3, 3 + ndim), 1, 2)  # -> N *s G C
        x2 = x.transpose(perm)
        x2 = x2.reshape(*x2.shape[:-2], g * x2.shape[-1])
        inv = (0, ndim + 1, ndim + 2, *range(1, ndim + 1))

        def restore(y):
            y = y.reshape(*y.shape[:-1], g, y.shape[-1] // g)
            return y.transpose(inv)

        return x2, g, restore
    raise ValueError(f"unsupported activation layout {layout!r}")


def _filt_to_hwio(w, layout: str, ndim: int):
    """Normalize a CK filter layout to [*filter, C/groups, K_total] HWIO.

    Supported (rank-generic): KYXC (K *s C — CK's fwd default), KCYX
    (K C *s — torch OIHW), GKYXC / GKCYX (explicit group dim; K_total is
    group-major G*K, matching feature_group_count's output order).
    """
    # rank-generic spatial token: CK uses X / YX / ZYX for 1/2/3d
    sp = "DHW"[3 - ndim:]
    sp_tok = {1: "X", 2: "YX", 3: "ZYX"}[ndim]
    canon = layout.upper().replace(sp_tok, "S").replace(sp, "S")
    if canon == "KSC":
        perm = (*range(1, 1 + ndim), ndim + 1, 0)
        return w.transpose(perm)
    if canon == "KCS":
        perm = (*range(2, 2 + ndim), 1, 0)
        return w.transpose(perm)
    if canon == "GKSC":
        g, k = w.shape[0], w.shape[1]
        perm = (*range(2, 2 + ndim), ndim + 2, 0, 1)  # -> *s C G K
        w2 = w.transpose(perm)
        return w2.reshape(*w2.shape[:-2], g * k)
    if canon == "GKCS":
        g, k = w.shape[0], w.shape[1]
        perm = (*range(3, 3 + ndim), 2, 0, 1)  # -> *s C G K
        w2 = w.transpose(perm)
        return w2.reshape(*w2.shape[:-2], g * k)
    if canon == "SIO" or canon == "HWIO":
        return w
    raise ValueError(f"unsupported filter layout {layout!r}")


def conv_fwd_layout(
    x,
    w,
    *,
    layout: str = "NHWC",
    filter_layout: str = "KYXC",
    groups: int = 1,
    **kw,
):
    """Layout-dispatching grouped conv fwd: CK's layout zoo on the NHWC path.

    CK enumerates G-interleaved activation/filter layouts as distinct
    template instantiations (device_operation_instance_factory.hpp:52-96 —
    NHWGC/NGCHW/GKYXC/GKCYX and rank variants); here they are coordinate
    adapters in front of ``conv_fwd`` — XLA folds the transposes into the
    conv's dimension numbers, so non-NHWC layouts cost a relayout only when
    the hardware-preferred tiling actually requires one.

    Explicit-G layouts (NHWGC/NGCHW/GK...) carry their group count in the
    shape; ``groups`` is for folded layouts (NHWC/NCHW with C = G*C_g).
    Output is returned in the activation layout's family ([N, *s, G, K/G]
    for NHWGC, [N, G, K/G, *s] for NGCHW, channels-first for NCHW).
    """
    ndim = x.ndim - 2 - (1 if layout.upper().find("G") >= 0 else 0)
    x2, g_layout, restore = _act_to_channels_last(x, layout, ndim)
    w2 = _filt_to_hwio(w, filter_layout, ndim)
    if g_layout > 1:
        assert groups in (1, g_layout), (groups, g_layout)
        groups = g_layout
    y = conv_fwd(x2, w2, groups=groups, **kw)
    return restore(y)


def conv_bwd_data(
    dy, w, input_spatial, *, strides=None, dilations=None, padding=None,
    groups: int = 1, out_dtype=None,
):
    """dx from dy and w (CK device_grouped_conv_bwd_data).

    dy: [N, *out_spatial, K]; w: [*filter, C/groups, K]; returns
    [N, *input_spatial, C]. Derived as the VJP of the forward conv — XLA
    lowers it to the same transposed implicit GEMM CK's bwd-data transform
    builds (transform_conv_bwd_data_to_gemm_v1.hpp).
    """
    ndim = dy.ndim - 2
    c = w.shape[-2] * groups
    x_shape = (dy.shape[0], *input_spatial, c)

    def f(x):
        return conv_fwd(
            x, w.astype(jnp.float32), strides=strides, dilations=dilations,
            padding=padding, groups=groups, out_dtype=jnp.float32,
        )

    _, vjp = jax.vjp(f, jnp.zeros(x_shape, jnp.float32))
    (dx,) = vjp(dy.astype(jnp.float32))
    return dx.astype(out_dtype or dy.dtype)


def conv_bwd_weight(
    x, dy, filter_shape, *, strides=None, dilations=None, padding=None,
    groups: int = 1, out_dtype=None,
):
    """dw from x and dy (CK device_grouped_conv_bwd_weight).

    Derived via jax.grad of the forward — XLA emits the same
    batch-as-contraction GEMM CK's two-stage bwd-weight builds by hand.
    """
    ndim = x.ndim - 2
    w_shape = (*filter_shape, x.shape[-1] // groups, dy.shape[-1])

    def f(w):
        return conv_fwd(
            x.astype(jnp.float32), w, strides=strides, dilations=dilations,
            padding=padding, groups=groups, out_dtype=jnp.float32,
        )

    zero_w = jnp.zeros(w_shape, jnp.float32)
    _, vjp = jax.vjp(f, zero_w)
    (dw,) = vjp(dy.astype(jnp.float32))
    return dw.astype(out_dtype or x.dtype)


def conv_int8(
    x_q,
    w_q,
    requant_op,
    ds=(),
    *,
    strides=None,
    dilations=None,
    padding=None,
    groups: int = 1,
):
    """int8 x int8 conv -> int32 acc -> requant epilogue -> int8.

    CK example/40_conv2d_quantization parity: ``requant_op`` is an
    ``ops.epilogues`` ``*_mul_clamp`` factory result; per-layer scale is a
    scalar, per-channel a [K] row carried via ``ds``.
    """
    acc = conv_fwd(
        x_q, w_q, strides=strides, dilations=dilations, padding=padding,
        groups=groups, acc_dtype=jnp.int32, c_op=None, out_dtype=jnp.int32,
    )
    out = requant_op(acc, *[jnp.asarray(d) for d in ds])
    return out.astype(jnp.int8)


def conv_wo_quant(
    x,
    w_q,
    scales,
    ds=(),
    *,
    strides=None,
    dilations=None,
    padding=None,
    groups: int = 1,
    c_op=None,
    out_dtype=None,
):
    """Weight-only quantized conv: W stored int8 with per-K-channel scales.

    The filter is tiny relative to activations, so dequantizing it in HBM
    (fused by XLA into the conv's weight read) costs nothing — unlike GEMM
    weights, which our S2 kernels dequantize on the fly in VMEM.
    """
    w = w_q.astype(jnp.float32) * jnp.asarray(scales, jnp.float32)
    return conv_fwd(
        x, w.astype(x.dtype), strides=strides, dilations=dilations,
        padding=padding, groups=groups, ds=ds, c_op=c_op, out_dtype=out_dtype,
    )


def conv_w4a8_gemm(
    x,
    w_packed,
    scales,
    ds=(),
    *,
    filter_shape,
    strides=None,
    dilations=None,
    padding=None,
    group_size,
    c_op=None,
    out_dtype=None,
    config=None,
    interpret=None,
):
    """Fully-quantized conv on the int8 MXU: im2col -> per-patch int8
    activation quant -> W4A8 GEMM (ops/quant/w4a8.py).

    The conv composition of the W4A8 path: each im2col row (one output
    position's receptive field) gets its own int8 scale, the int4 filter
    streams packed (``quantize_conv_filter(..., pack="w4a8")``), and the
    dots run on the int8 MXU. Pad rows of the pack-aligned K contribute
    exactly zero (the offset correction sums the zero activation columns).
    CK analog: the int8 conv examples (example/40) + the dequant-transfer
    conv, fused one level further.
    """
    from composable_kernel_tpu.ops.quant import quantize_act_token, w4a8_gemm
    from composable_kernel_tpu.ops.tensor_ops import (
        _conv_geometry,
        image_to_column,
    )

    ndim = x.ndim - 2
    strides, dilations, padding = _norm_args(ndim, strides, dilations, padding)
    assert not isinstance(padding, str), "explicit pads only on the GEMM route"
    cols = image_to_column(
        x, filter_shape, strides=strides, dilations=dilations, pads=padding
    )
    k_w = w_packed.shape[0] * 2
    if cols.shape[1] < k_w:
        cols = jnp.pad(cols, ((0, 0), (0, k_w - cols.shape[1])))
    cols_q, cols_s = quantize_act_token(cols)
    out = w4a8_gemm(
        cols_q, cols_s, w_packed, scales, ds,
        group_size=group_size, c_op=c_op,
        out_dtype=out_dtype or x.dtype, config=config, interpret=interpret,
    )
    out_sp = _conv_geometry(
        x.shape[1:-1], filter_shape, strides, dilations,
        [p[0] for p in padding], [p[1] for p in padding],
    )
    return out.reshape(x.shape[0], *out_sp, out.shape[-1])


def quantize_conv_filter(filt, *, group_size=None, bits=4, pack="w4a16"):
    """Flatten an HWIO filter to GEMM rows and quantize for the explicit-
    GEMM conv route, padding K = prod(filter)*C up to the packed-int4
    alignment (the split-halves layout needs each half 128-row aligned;
    zero rows quantize to 0 and contribute nothing).

    Returns (w_q [packed int4 / int8], scales). Use with
    :func:`conv_wo_quant_gemm`, which re-derives the padded K from the
    weight and pads the im2col matrix to match.
    """
    from composable_kernel_tpu import dtypes
    from composable_kernel_tpu.reference.quant import (
        ref_quantize_group,
        ref_quantize_per_channel,
    )

    k_out = filt.shape[-1]
    wf = jnp.asarray(filt, jnp.float32).reshape(-1, k_out)
    k_flat = wf.shape[0]
    if bits == 8 and group_size is None:
        return ref_quantize_per_channel(wf, bits=8)
    assert bits == 4 and group_size is not None
    g = group_size
    assert 128 % g == 0 or g % 128 == 0, (
        f"group {g} must align with the 128-row pack tile"
    )
    align = max(256, 2 * g)
    k_pad = -(-k_flat // align) * align
    wf = jnp.pad(wf, ((0, k_pad - k_flat), (0, 0)))
    w_q, s = ref_quantize_group(wf, group_size=g, bits=4)
    pack_fn = dtypes.pack_int4 if pack == "w4a16" else dtypes.pack_int4_w4a8
    return pack_fn(w_q, axis=0), s


def conv_wo_quant_gemm(
    x,
    w_q,
    scales,
    ds=(),
    *,
    filter_shape,
    strides=None,
    dilations=None,
    padding=None,
    group_size=None,
    packed_int4=False,
    c_op=None,
    out_dtype=None,
    config=None,
    interpret=None,
):
    """Explicit-GEMM weight-only quant conv: im2col + in-VMEM dequant GEMM.

    The route CK's dequant-transfer conv would take (implicit GEMM with the
    ``_dequant`` threadwise copy): the quantized filter streams from HBM in
    its packed form and is dequantized inside the GEMM kernel's VMEM tiles
    (S2 machinery), unlike :func:`conv_wo_quant` which dequantizes in HBM.
    Worth it when the filter is large relative to activations (late-stage
    conv nets, 1x1-heavy blocks at big C/K).

    x: [N, *spatial, C]. w_q: quantized filter flattened to GEMM layout
    [prod(filter)*C, K] (int8; packed int4 rows when ``packed_int4``) —
    i.e. ``quantize(w.reshape(-1, K))`` of an HWIO filter. scales: [K]
    per-channel or [G, K] group-wise. Returns [N, *out_spatial, K].
    """
    from composable_kernel_tpu.ops.quant import wo_quant_gemm
    from composable_kernel_tpu.ops.tensor_ops import (
        _conv_geometry,
        image_to_column,
    )

    ndim = x.ndim - 2
    strides, dilations, padding = _norm_args(ndim, strides, dilations, padding)
    assert not isinstance(padding, str), "explicit pads only on the GEMM route"
    cols = image_to_column(
        x, filter_shape, strides=strides, dilations=dilations, pads=padding
    )
    # zero-pad the patch matrix to the weight's (possibly pack-aligned) K
    k_w = w_q.shape[0] * 2 if packed_int4 else w_q.shape[0]
    if cols.shape[1] < k_w:
        cols = jnp.pad(cols, ((0, 0), (0, k_w - cols.shape[1])))
    if config is None:
        # conv GEMM-K = prod(filter)*C is small and rarely a 128-multiple;
        # one whole-K block sidesteps Mosaic's last-dim divisibility rule
        # (a block equal to the full array dim is always legal) and keeps
        # every group/scale row in the single step.
        from composable_kernel_tpu.ops.gemm.config import GemmConfig

        k_flat = cols.shape[1]
        config = GemmConfig(block_m=512, block_n=512, block_k=k_flat)
    out = wo_quant_gemm(
        cols, w_q, scales, ds,
        group_size=group_size, packed_int4=packed_int4, c_op=c_op,
        out_dtype=out_dtype, config=config, interpret=interpret,
    )
    out_sp = _conv_geometry(
        x.shape[1:-1], filter_shape, strides, dilations,
        [p[0] for p in padding], [p[1] for p in padding],
    )
    k_out = out.shape[-1]
    return out.reshape(x.shape[0], *out_sp, k_out)
