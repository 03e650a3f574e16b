"""Ragged / grouped GEMM kernel (MoE + continuous-batching building block).

TPU re-design of CK's grouped GEMM with device-side arguments:
``device_grouped_gemm_fixed_nk.hpp`` (SetDeviceKernelArgs:56-57 — per-group
sizes live in a device buffer, arbitrary at launch time) and the
persistent-kernel ``device_grouped_gemm_tile_loop.hpp:26-95`` (grid is a
flat tile loop; each tile reads its group's args on device, so the host
never sees group sizes).

Here the same idea maps to Pallas scalar prefetch. ``group_sizes`` is
ARBITRARY (device-side values, no alignment contract — matching CK's
fixed-NK): the host traces a static worst-case step count
(m_tiles + G - 1), and a device-computed step table assigns each grid step
a (m_tile, group, row_lo, row_hi) quadruple. An m-tile that straddles a
group boundary is visited once per group with disjoint row masks; the
masked stores merge in the tile's VMEM output block, which Pallas flushes
only when the grid moves to the next tile (steps are ordered so every
output block is visited contiguously).

Layout contract (fixed-NK): every group shares one K and N; group g's rows
occupy A[starts[g] : starts[g]+group_sizes[g]] with no padding between
groups. Rows past ``sum(group_sizes)`` are computed against the last group
(harmless — callers slice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.gemm.config import GemmConfig
from composable_kernel_tpu.ops.gemm.kernel import (
    _interpret_default,
    pad_to,
    sublane_align,
    _ceil_mult,
)


def _ragged_kernel(tbl_ref, a_ref, b_ref, *rest, n_k_steps,
                   c_op, bm, bn, has_scales):
    if has_scales:
        s_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    s = pl.program_id(1)
    k_idx = pl.program_id(2)
    live = tbl_ref[2, s] < tbl_ref[3, s]

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(live)
    def _step():
        b_tile = b_ref[0]
        if has_scales:
            # weight-only int8 B: convert pre-MXU; the per-channel scale
            # commutes with the K reduction and lands on the accumulator
            # (CK grouped bf16xint8 client, 31_grouped_gemm_bf16Aint8B)
            b_tile = b_tile.astype(a_ref.dtype)
        acc_ref[...] += jnp.dot(
            a_ref[...], b_tile, preferred_element_type=acc_ref.dtype
        )

    @pl.when(k_idx == n_k_steps - 1)
    def _finish():
        acc = acc_ref[...]
        if has_scales:
            acc = acc * s_ref[0].astype(jnp.float32)  # [1, bn] broadcast
        if c_op is not None:
            acc = c_op(acc)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        mask = (rows >= tbl_ref[2, s]) & (rows < tbl_ref[3, s])
        out_ref[...] = jnp.where(mask, acc.astype(out_ref.dtype), out_ref[...])


# step-table construction lives in the shared block-index algebra library
from composable_kernel_tpu.indexing import ragged_step_table as _step_table


def ragged_gemm(
    group_sizes,
    a,
    b,
    *,
    scales=None,
    c_op=None,
    out_dtype=None,
    config: GemmConfig | None = None,
    interpret: bool | None = None,
):
    """out[sum_M, N] — each row block of A hits its group's B[g].

    group_sizes: [G] int32, ARBITRARY device-side values (CK fixed-NK
    contract, device_grouped_gemm_fixed_nk.hpp:56). Group g's rows are
    A[sum(sizes[:g]) : sum(sizes[:g+1])], tightly packed.
    scales: optional [G, N] f32 — B is int8 weight-only quantized per
    output channel, dequantized in-kernel (the grouped analog of
    ``wo_quant_gemm``; CK client 31_grouped_gemm_bf16Aint8B).
    """
    m, k = a.shape
    g, k2, n = b.shape
    assert k == k2
    if out_dtype is None:
        out_dtype = a.dtype
    if interpret is None:
        interpret = _interpret_default()

    cfg = config or GemmConfig(block_m=128, block_n=min(512, _ceil_mult(n, 128)), block_k=512)
    m_align = max(sublane_align(a.dtype), sublane_align(out_dtype))
    bm = max(m_align, min(_ceil_mult(cfg.block_m, m_align), _ceil_mult(m, m_align)))
    bn = max(128, min(cfg.block_n, _ceil_mult(n, 128)))
    bk = max(128, min(cfg.block_k, _ceil_mult(k, max(sublane_align(b.dtype), 128))))

    a_p = pad_to(a, (bm, bk))
    b_p = pad_to(b, (0, bk, bn))
    mp, kp = a_p.shape
    np_ = b_p.shape[2]
    n_k_steps = kp // bk
    n_m_tiles = mp // bm

    tbl = _step_table(group_sizes, n_m_tiles, bm, g, mp)
    n_steps = tbl.shape[1]

    has_scales = scales is not None
    in_specs = [
        pl.BlockSpec(
            (bm, bk), lambda j, s, kk, tbl: (tbl[0, s], kk),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (1, bk, bn),
            lambda j, s, kk, tbl: (tbl[1, s], kk, j),
            memory_space=pltpu.VMEM,
        ),
    ]
    inputs = [a_p, b_p]
    if has_scales:
        assert scales.shape == (g, n), (scales.shape, (g, n))
        # [G, 1, N] with a (1, 1, bn) block: trailing dims satisfy the
        # Mosaic rule (a (1, bn) block over [G, N] does not when G > 1)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, bn), lambda j, s, kk, tbl: (tbl[1, s], 0, j),
                memory_space=pltpu.VMEM,
            )
        )
        inputs.append(
            pad_to(jnp.asarray(scales, jnp.float32), (None, bn))[:, None, :]
        )

    kernel = functools.partial(
        _ragged_kernel, n_k_steps=n_k_steps, c_op=c_op, bm=bm, bn=bn,
        has_scales=has_scales,
    )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # the step table
            # j outermost so each output tile sees its straddling steps
            # back-to-back and stays resident in VMEM between them
            grid=(np_ // bn, n_steps, n_k_steps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bm, bn), lambda j, s, kk, tbl: (tbl[0, s], j),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(tbl, *inputs)

    return out[:m, :n]
