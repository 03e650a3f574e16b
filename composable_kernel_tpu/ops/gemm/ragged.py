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

from composable_kernel_tpu import indexing
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


# ------------------------------------------------------- W4A8 grouped ------


def _ragged_w4a8_kernel(tbl_ref, a_lo_ref, a_hi_ref, b_ref, s_lo_ref,
                        s_hi_ref, as_ref, out_ref, acc_ref, *,
                        n_k_steps, c_op, bm, bn, s_rows, gsz):
    """Grouped W4A8: per-expert packed-int4 B on the int8 MXU.

    Same step-table walk as ``_ragged_kernel``; per K-step the AND-only
    nibble extraction + per-group int8 dots + inline offset correction of
    ``ops/quant/w4a8.py``. s_hi rows are pre-divided by 16 on the host.
    """
    s = pl.program_id(1)
    k_idx = pl.program_id(2)
    live = tbl_ref[2, s] < tbl_ref[3, s]

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(live)
    def _step():
        packed = b_ref[0]
        l8 = packed & jnp.int8(0x0F)
        h16 = packed & jnp.int8(-16)
        a_lo = a_lo_ref[...]
        a_hi = a_hi_ref[...]
        acc = acc_ref[...]
        for r in range(s_rows):
            ks = slice(r * gsz, (r + 1) * gsz)
            sl = s_lo_ref[0, r : r + 1]
            sh = s_hi_ref[0, r : r + 1]
            a_lo_r = a_lo[:, ks]
            d_lo = jnp.dot(a_lo_r, l8[ks], preferred_element_type=jnp.int32)
            d_hi = jnp.dot(a_hi[:, ks], h16[ks], preferred_element_type=jnp.int32)
            rs = jnp.sum(a_lo_r.astype(jnp.int32), axis=1, keepdims=True)
            acc = acc + (
                (d_lo - 8 * rs).astype(jnp.float32) * sl
                + d_hi.astype(jnp.float32) * sh
            )
        acc_ref[...] = acc

    @pl.when(k_idx == n_k_steps - 1)
    def _finish():
        acc = acc_ref[...] * as_ref[...]
        if c_op is not None:
            acc = c_op(acc)
        rows = jax.lax.broadcasted_iota(jnp.int32, (bm, bn), 0)
        mask = (rows >= tbl_ref[2, s]) & (rows < tbl_ref[3, s])
        out_ref[...] = jnp.where(mask, acc.astype(out_ref.dtype), out_ref[...])


def ragged_w4a8_gemm(
    group_sizes,
    a_q,
    a_scales,
    b_packed,
    scales,
    *,
    group_size: int,
    c_op=None,
    out_dtype=jnp.bfloat16,
    config: GemmConfig | None = None,
    interpret: bool | None = None,
):
    """Grouped W4A8 GEMM: per-expert int4 weights x per-token int8 acts.

    The MoE decode composition of the W4A8 path (CK analog: grouped
    fixed-NK x the fpAintB dequant — client 31 with the offset-binary
    int8-MXU layout). Arbitrary device-side ``group_sizes`` as in
    :func:`ragged_gemm`.

    a_q:      [sum_M, K] int8 (``quantize_act_token``)
    a_scales: [sum_M] or [sum_M, 1] f32
    b_packed: [G, K//2, N] int8, per-expert ``dtypes.pack_int4_w4a8``
    scales:   [G, K//group_size, N] f32
    """
    m, k = a_q.shape
    g, kb, n = b_packed.shape
    assert kb * 2 == k, (kb, k)
    assert k % group_size == 0
    assert scales.shape == (g, k // group_size, n), scales.shape
    if interpret is None:
        interpret = _interpret_default()
    a_scales = jnp.asarray(a_scales, jnp.float32).reshape(m, 1)
    scales = jnp.asarray(scales, jnp.float32)

    cfg = config or GemmConfig(
        block_m=128, block_n=min(1024, _ceil_mult(n, 128)), block_k=1024,
    )
    bm = max(32, min(_ceil_mult(cfg.block_m, 32), _ceil_mult(m, 32)))
    bn = max(128, min(cfg.block_n, _ceil_mult(n, 128)))
    half_seg = kb
    bpk = indexing.fit_packed_block(
        cfg.block_k // 2 if cfg.block_k // 2 >= 128 else cfg.block_k,
        half_seg, group_size,
    )
    n_k_steps = kb // bpk
    s_rows = max(1, bpk // group_size)
    gsz = bpk // s_rows

    a_p = pad_to(a_q, (bm, None))
    as_p = pad_to(a_scales, (bm, None))
    b_p = pad_to(b_packed, (0, None, bn))
    mp = a_p.shape[0]
    np_ = b_p.shape[2]
    n_m_tiles = mp // bm

    # per-expert per-K-step scale blocks (lo rows; hi rows pre-divided by
    # 16), 8-row aligned: [G, n_k_steps * srb, Np]
    s_pad = pad_to(scales, (0, None, bn))
    lo_starts, hi_starts = indexing.split_halves_scale_starts(
        n_k_steps, bpk, half_seg, group_size
    )
    idx, srb = indexing.group_scale_row_table(lo_starts, s_rows)
    s_lo = jnp.take(s_pad, jnp.asarray(idx), axis=1)
    idx_h, _ = indexing.group_scale_row_table(hi_starts, s_rows)
    s_hi = jnp.take(s_pad * (1.0 / 16.0), jnp.asarray(idx_h), axis=1)

    tbl = _step_table(group_sizes, n_m_tiles, bm, g, mp)
    n_steps = tbl.shape[1]

    kernel = functools.partial(
        _ragged_w4a8_kernel, n_k_steps=n_k_steps, c_op=c_op, bm=bm, bn=bn,
        s_rows=s_rows, gsz=gsz,
    )
    scale_spec = lambda: pl.BlockSpec(
        (1, srb, bn), lambda j, s, kk, tbl: (tbl[1, s], kk, j),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(np_ // bn, n_steps, n_k_steps),
            in_specs=[
                pl.BlockSpec(
                    (bm, bpk),
                    lambda j, s, kk, tbl: (
                        tbl[0, s],
                        indexing.split_halves_a_block(kk, bpk, half_seg, hi=False),
                    ),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bm, bpk),
                    lambda j, s, kk, tbl: (
                        tbl[0, s],
                        indexing.split_halves_a_block(kk, bpk, half_seg, hi=True),
                    ),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, bpk, bn), lambda j, s, kk, tbl: (tbl[1, s], kk, j),
                    memory_space=pltpu.VMEM,
                ),
                scale_spec(),
                scale_spec(),
                pl.BlockSpec(
                    (bm, 1), lambda j, s, kk, tbl: (tbl[0, s], 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
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
    )(tbl, a_p, a_p, b_p, s_lo, s_hi, as_p)

    return out[:m, :n]
