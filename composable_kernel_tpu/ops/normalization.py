"""Softmax / LayerNorm / RMSNorm / GroupNorm / BatchNorm Pallas kernels.

TPU re-design of CK's normalization stack:

  - ``device_softmax.hpp`` / ``gridwise_softmax.hpp`` — y = alpha*softmax(x)
    + beta*prior, reduced over the inner dim with blockwise max/sum.
  - ``device_normalization_fwd.hpp`` + Welford gridwise kernels
    (``blockwise_welford.hpp``, ``gridwise_normalization_*``) — layernorm /
    groupnorm returning (y, mean, inv_std).
  - ``device_elementwise_normalization.hpp`` — fused residual-add +
    layernorm (the ``pre_add`` argument).
  - ``device_batchnorm_{forward,infer}.hpp`` — batchnorm over NHWC.

Design: one grid row-block per program with the full normalized axis in
VMEM (fine through N ~ 8k in f32; Welford multi-block splitting is not
needed on TPU because a single core's VMEM covers every practical row —
CK needs multiblock Welford because a GPU block is much smaller). The
row-axis mean/var reductions run on the VPU; XLA/Mosaic fuses the
surrounding elementwise math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.gemm.kernel import (
    _ceil_mult,
    _interpret_default,
    pad_to,
    sublane_align,
)

__all__ = ["softmax", "layernorm", "rmsnorm", "groupnorm", "batchnorm_infer"]


def _rows_blocking(x, n_cols_real):
    """Flatten leading dims to rows; choose a VMEM-budgeted row block size.

    The kernel holds ~5 f32 copies of the (br, Np) tile (input, output,
    masked temp, centered temp, exp/etc.), so br is sized to keep that
    under ~6MB of the 16MB VMEM.
    """
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    x2 = x.reshape(rows, x.shape[-1])
    align = sublane_align(x.dtype)
    np_ = _ceil_mult(x.shape[-1], 128)
    budget_rows = max(1, (6 * 1024 * 1024) // (5 * 4 * np_))
    br = max(align, (min(256, budget_rows) // align) * align)
    br = min(br, _ceil_mult(rows, align))
    return x2, rows, br


# ------------------------------------------------------------- softmax ------


def _softmax_kernel(x_ref, prior_ref, o_ref, *, alpha, beta, n_real, has_prior):
    x = x_ref[...].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    x = jnp.where(col < n_real, x, -1e30)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    y = alpha * (e / s)
    if has_prior:
        y = y + beta * prior_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)


#: rows longer than this exceed the one-row-block VMEM budget; fall back to
#: the XLA path (the analog of CK's multiblock Welford split, which exists
#: because GPU blocks are small — XLA's reduce handles any length natively)
_MAX_KERNEL_COLS = 32768


def softmax(x, *, alpha=1.0, beta=0.0, prior=None, interpret=None):
    """y = alpha * softmax(x, axis=-1) + beta * prior (CK device_softmax)."""
    if interpret is None:
        interpret = _interpret_default()
    n = x.shape[-1]
    if n > _MAX_KERNEL_COLS:
        from composable_kernel_tpu.reference.normalization import ref_softmax

        return ref_softmax(x, alpha=alpha, beta=beta, prior=prior)
    x2, rows, br = _rows_blocking(x, n)
    np_ = _ceil_mult(n, 128)
    x_p = pad_to(x2, (br, 128))
    has_prior = prior is not None and beta != 0.0
    inputs = [x_p]
    in_specs = [
        pl.BlockSpec((br, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    if has_prior:
        p2 = pad_to(prior.reshape(rows, n), (br, 128))
        inputs.append(p2)
        in_specs.append(
            pl.BlockSpec((br, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(
            _softmax_kernel if has_prior else _softmax_no_prior,
            alpha=alpha, beta=beta, n_real=n, has_prior=has_prior,
        ),
        out_shape=jax.ShapeDtypeStruct(x_p.shape, x.dtype),
        grid=(x_p.shape[0] // br,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((br, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*inputs)
    return out[:rows, :n].reshape(x.shape)


def _softmax_no_prior(x_ref, o_ref, *, alpha, beta, n_real, has_prior):
    _softmax_kernel(x_ref, None, o_ref, alpha=alpha, beta=beta, n_real=n_real,
                    has_prior=False)


# ----------------------------------------------------------- layernorm ------


def _layernorm_kernel(
    *refs, eps, n_real, has_pre_add, rms_only, save_stats
):
    idx = 0
    x_ref = refs[idx]; idx += 1
    if has_pre_add:
        r_ref = refs[idx]; idx += 1
    g_ref = refs[idx]; idx += 1
    b_ref = None
    if not rms_only:
        b_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    if save_stats:
        mean_ref = refs[idx]; idx += 1
        inv_ref = refs[idx]; idx += 1

    x = x_ref[...].astype(jnp.float32)
    if has_pre_add:
        x = x + r_ref[...].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    valid = col < n_real
    xm = jnp.where(valid, x, 0.0)
    inv_n = 1.0 / n_real
    if rms_only:
        ms = jnp.sum(xm * xm, axis=-1, keepdims=True) * inv_n
        inv_std = jax.lax.rsqrt(ms + eps)
        y = x * inv_std * g_ref[...].astype(jnp.float32)
        mean = jnp.zeros_like(inv_std)
    else:
        mean = jnp.sum(xm, axis=-1, keepdims=True) * inv_n
        var = jnp.sum(jnp.where(valid, (x - mean) ** 2, 0.0), axis=-1,
                      keepdims=True) * inv_n
        inv_std = jax.lax.rsqrt(var + eps)
        y = (x - mean) * inv_std * g_ref[...].astype(jnp.float32)
        y = y + b_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)
    if save_stats:
        mean_ref[...] = jnp.broadcast_to(mean, mean_ref.shape)
        inv_ref[...] = jnp.broadcast_to(inv_std, inv_ref.shape)


def _norm_call(x, gamma, beta, eps, pre_add, rms_only, save_stats, interpret):
    if interpret is None:
        interpret = _interpret_default()
    n = x.shape[-1]
    if n > _MAX_KERNEL_COLS:
        from composable_kernel_tpu.reference import normalization as rn

        if rms_only:
            return rn.ref_rmsnorm(x, gamma, eps=eps)
        y, mean, inv = rn.ref_layernorm(x, gamma, beta, eps=eps, pre_add=pre_add)
        if save_stats:
            return y, mean[..., 0], inv[..., 0]
        return y
    x2, rows, br = _rows_blocking(x, n)
    np_ = _ceil_mult(n, 128)
    x_p = pad_to(x2, (br, 128))
    nblocks = x_p.shape[0] // br

    inputs = [x_p]
    row_spec = pl.BlockSpec((br, np_), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, np_), lambda i: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [row_spec]
    if pre_add is not None:
        inputs.append(pad_to(pre_add.reshape(rows, n), (br, 128)))
        in_specs.append(row_spec)
    inputs.append(pad_to(gamma.reshape(1, n), (None, 128)))
    in_specs.append(vec_spec)
    if not rms_only:
        inputs.append(pad_to(beta.reshape(1, n), (None, 128)))
        in_specs.append(vec_spec)

    out_shapes = [jax.ShapeDtypeStruct(x_p.shape, x.dtype)]
    out_specs = [row_spec]
    if save_stats:
        stat_spec = pl.BlockSpec(
            (br, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out_shapes += [
            jax.ShapeDtypeStruct((x_p.shape[0], 128), jnp.float32),
            jax.ShapeDtypeStruct((x_p.shape[0], 128), jnp.float32),
        ]
        out_specs += [stat_spec, stat_spec]

    outs = pl.pallas_call(
        functools.partial(
            _layernorm_kernel,
            eps=eps, n_real=n, has_pre_add=pre_add is not None,
            rms_only=rms_only, save_stats=save_stats,
        ),
        out_shape=out_shapes,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(*inputs)
    y = outs[0][:rows, :n].reshape(x.shape)
    if save_stats:
        mean = outs[1][:rows, 0].reshape(x.shape[:-1])
        inv_std = outs[2][:rows, 0].reshape(x.shape[:-1])
        return y, mean, inv_std
    return y


def layernorm(x, gamma, beta, *, eps=1e-5, pre_add=None, save_stats=False,
              interpret=None):
    """y = gamma*(x-mean)/sqrt(var+eps) + beta over the last axis.

    ``pre_add`` fuses a residual add before normalization (CK
    device_elementwise_normalization). ``save_stats`` also returns
    (mean, inv_std) like CK's normalization_fwd.
    """
    return _norm_call(x, gamma, beta, eps, pre_add, False, save_stats, interpret)


def rmsnorm(x, gamma, *, eps=1e-6, pre_add=None, interpret=None):
    """RMSNorm over the last axis (Llama-family; CK via layernorm variants)."""
    return _norm_call(x, gamma, None, eps, pre_add, True, False, interpret)


# ----------------------------------------------------------- groupnorm ------


def groupnorm(x, gamma, beta, num_groups, *, eps=1e-5, interpret=None):
    """GroupNorm over NHWC grouped on C (CK device_groupnorm via swizzle).

    Rearranges to rows of (H*W*C/G) per (N, group) and reuses the layernorm
    kernel — the CK move of expressing norm variants as one gridwise kernel
    over a transformed view (operator-transform layer, SURVEY.md L2).
    """
    n, h, w, c = x.shape
    g = num_groups
    cg = c // g
    # [N,H,W,G,cg] -> [N,G,H,W,cg] rows of length H*W*cg
    xr = x.reshape(n, h, w, g, cg).transpose(0, 3, 1, 2, 4).reshape(n * g, h * w * cg)
    ones = jnp.ones((h * w * cg,), jnp.float32)
    zeros = jnp.zeros((h * w * cg,), jnp.float32)
    y = _norm_call(xr, ones, zeros, eps, None, False, False, interpret)
    y = y.reshape(n, g, h, w, cg).transpose(0, 2, 3, 1, 4).reshape(n, h, w, c)
    y = y.astype(jnp.float32) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def batchnorm_infer(x, gamma, beta, mean, var, *, eps=1e-5):
    """Inference batchnorm over NHWC (CK device_batchnorm_infer).

    Pure elementwise with per-C constants — XLA already emits the optimal
    fused VPU loop, so no Pallas kernel is warranted (SURVEY.md §7 stance).
    """
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    y = (xf - mean) * inv * gamma + beta
    return y.astype(x.dtype)
