"""fp8 GEMM with blockwise A/B scales (microscaling).

CK parity: the AB-scale GEMM stack — ``device_gemm_multiple_d_ab_scale.hpp``,
``device_gemm_multiple_d_xdl_cshuffle_v3_ab_scale.hpp`` and the
``blockwise_gemm_pipeline_xdlops_v1/v2/v3_ab_scale.hpp`` pipelines, demoed
by ``example/65_gemm_multiply_multiply/gemm_multiply_multiply_xdl_fp8_ab_scale
.cpp``: A and B are fp8 with per-block f32 scales folded in during the
K loop (the DeepSeek-V3 / microscaling recipe).

Scale granularity (matching the common fp8 serving recipe):
  - A: per [1, SCALE_K] tiles -> a_scale [M, K/SCALE_K]
  - B: per [SCALE_K, SCALE_K] tiles -> b_scale [K/SCALE_K, N/SCALE_K]

Kernel: the scales are folded into the *operand tiles* in VMEM before the
dot — O(M*K) + O(K*N) VPU work (an accumulator rescale per 128-K step
would be O(M*N*K/128), measured 7x slower) — so each grid step runs one
deep-K bf16 dot on the MXU, exactly the dequant-before-MXU structure of
the int4/int8 kernels. Per-step scale rows are host-expanded to
8-row-aligned blocks (Mosaic sublane divisibility).

Perf note (measured, v5e): this chip has no native fp8 — the fp8->bf16
convert is software-emulated and caps ANY fp8 GEMM at ~33 TFlops (a
convert-only fp8 matmul measures 33.4 vs 166.7 for bf16 at the same tile
config; the ab-scale machinery itself is ~free at 29.5). On fp8-native
TPU generations Mosaic lowers the convert/dot natively and this kernel's
structure is the right one. On v5e, prefer the int8/int4 dequant GEMMs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.gemm.config import GemmConfig
from composable_kernel_tpu.ops.gemm.kernel import (
    _ceil_mult,
    _interpret_default,
    pad_to,
)

__all__ = ["fp8_gemm_ab_scale", "ref_fp8_gemm_ab_scale", "quantize_fp8_blockwise"]

SCALE_K = 128  # scale granularity along K (and N for B)
_SUB = 8  # f32 sublane alignment for the expanded scale rows


def _kernel(
    a_ref, b_ref, as_ref, bs_ref, *rest, n_ds, c_op, n_k_steps, ng,
):
    d_refs = rest[:n_ds]
    out_ref = rest[n_ds]
    acc_ref = rest[n_ds + 1]
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = a_ref[...].astype(jnp.float32)  # [bm, bk]
    bm, bk = a.shape
    s_a = as_ref[0:ng]  # [ng, bm] (this step's A scale rows, transposed)
    a = (a.reshape(bm, ng, SCALE_K) * s_a.T[:, :, None]).reshape(bm, bk)
    b = b_ref[...].astype(jnp.float32)  # [bk, bn]
    s_b = bs_ref[0:ng]  # [ng, bn] (expanded per column)
    b = (b.reshape(ng, SCALE_K, -1) * s_b[:, None, :]).reshape(bk, -1)
    acc_ref[...] += jnp.dot(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k_idx == n_k_steps - 1)
    def _():
        acc = acc_ref[...]
        if c_op is not None:
            acc = c_op(acc, *[d[...] for d in d_refs])
        out_ref[...] = acc.astype(out_ref.dtype)


def fp8_gemm_ab_scale(
    a,
    a_scale,
    b,
    b_scale,
    ds=(),
    *,
    c_op=None,
    config: GemmConfig | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """C = c_op((A_fp8 * a_scale) @ (B_fp8 * b_scale), *Ds).

    a: [M, K] float8_e4m3fn;  a_scale: [M, K/128] f32
    b: [K, N] float8_e4m3fn;  b_scale: [K/128, N/128] f32
    """
    m, k = a.shape
    _, n = b.shape
    assert k % SCALE_K == 0 and n % SCALE_K == 0
    n_groups = k // SCALE_K
    assert a_scale.shape == (m, n_groups)
    assert b_scale.shape == (n_groups, n // SCALE_K)
    if interpret is None:
        interpret = _interpret_default()

    cfg = (config or GemmConfig(block_m=256, block_n=512, block_k=1024)).shrink_to(
        m, n, k
    )
    bm = max(32, _ceil_mult(min(cfg.block_m, m), 32))  # fp8 sublane tile 32
    bn = max(128, _ceil_mult(min(cfg.block_n, n), 128))
    bk = min(max(SCALE_K, (cfg.block_k // SCALE_K) * SCALE_K), k)
    ng = bk // SCALE_K  # scale groups per K step
    assert k % bk == 0, (k, bk)
    n_k_steps = k // bk
    srb = -(-ng // _SUB) * _SUB

    a_p = pad_to(a, (bm, None))
    b_p = pad_to(b, (None, bn))
    mp, np_ = a_p.shape[0], b_p.shape[1]

    # per-step expanded scales: step kk holds rows [kk*ng, (kk+1)*ng)
    a_t = pad_to(jnp.asarray(a_scale, jnp.float32).T, (None, mp))  # [G, Mp]
    b_cols = jnp.repeat(jnp.asarray(b_scale, jnp.float32), SCALE_K, axis=1)
    b_cols = pad_to(b_cols, (None, np_))  # [G, Np]
    if srb == ng:
        a_s, b_s = a_t, b_cols
    else:
        idx = []
        for kk in range(n_k_steps):
            idx += list(range(kk * ng, (kk + 1) * ng)) + [0] * (srb - ng)
        idx = jnp.asarray(idx, jnp.int32)
        a_s = jnp.take(a_t, idx, axis=0)
        b_s = jnp.take(b_cols, idx, axis=0)

    ds_p, d_specs = [], []
    for d in ds:
        if d.ndim == 1:
            ds_p.append(pad_to(d.reshape(1, -1), (None, bn)))
            d_specs.append(
                pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
            )
        else:
            ds_p.append(pad_to(d, (bm, bn)))
            d_specs.append(
                pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM)
            )

    out = pl.pallas_call(
        functools.partial(
            _kernel, n_ds=len(ds_p), c_op=c_op, n_k_steps=n_k_steps, ng=ng
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(mp // bm, np_ // bn, n_k_steps),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
                pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((srb, bm), lambda i, j, kk: (kk, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((srb, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                *d_specs,
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=int(mp * k + k * np_ + mp * np_ * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_p, b_p, a_s, b_s, *ds_p)
    return out[:m, :n]


def ref_fp8_gemm_ab_scale(a, a_scale, b, b_scale, ds=(), c_op=None,
                          out_dtype=jnp.bfloat16):
    """Host reference (cf. CK reference path for example/65).

    Dequantized operands round to bf16 before the dot — the matrix-unit
    semantics the kernel implements (same contract as ref_dequant_gemm).
    """
    af = a.astype(jnp.float32) * jnp.repeat(
        jnp.asarray(a_scale, jnp.float32), SCALE_K, axis=1
    )
    bs = jnp.repeat(
        jnp.repeat(jnp.asarray(b_scale, jnp.float32), SCALE_K, axis=0),
        SCALE_K, axis=1,
    )
    bf = b.astype(jnp.float32) * bs
    acc = jnp.matmul(
        af.astype(jnp.bfloat16).astype(jnp.float32),
        bf.astype(jnp.bfloat16).astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    if c_op is not None:
        acc = c_op(acc, *[jnp.asarray(d, jnp.float32) for d in ds])
    return acc.astype(out_dtype)


def quantize_fp8_blockwise(x, axis_block=(1, SCALE_K)):
    """Quantize f32/bf16 [R, C] to (fp8_e4m3, scales) with per-block absmax.

    axis_block=(1, 128) gives A-style per-token scales; (128, 128) B-style.
    """
    r, c = x.shape
    br, bc = axis_block
    assert r % br == 0 and c % bc == 0
    xf = x.astype(jnp.float32).reshape(r // br, br, c // bc, bc)
    absmax = jnp.max(jnp.abs(xf), axis=(1, 3))
    fp8_max = 448.0  # e4m3fn
    s = jnp.maximum(absmax / fp8_max, 1e-12)
    xq = (xf / s[:, None, :, None]).reshape(r, c).astype(jnp.float8_e4m3fn)
    return xq, s
