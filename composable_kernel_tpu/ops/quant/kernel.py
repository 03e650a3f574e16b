"""Weight-only dequant GEMM Pallas kernels (the north-star core).

TPU re-design of CK's fpAintB GEMM stack:

  - ``gridwise_fpAintB_gemm_wmma.hpp:553-570`` — B is dequantized to
    ADataType *before* the matrix unit consumes it; scales stay on-chip
    (``:735-766``). Here: the int8/int4 B tile is unpacked + converted in
    VMEM on the VPU, then fed to the MXU as bf16/fp16.
  - ``device_gemm_dequantB.hpp:24`` — the (A, B, scale, C) signature.
  - ``threadwise_tensor_slice_transfer_v3r1_dequant.hpp`` /
    ``thread_group_tensor_slice_transfer_v4r1_dequant.hpp`` — the fused
    dequant-during-copy. On TPU, Mosaic pipelines the HBM->VMEM copy; the
    convert+scale runs on the VPU tile just before the dot.
  - int4 unpack = the ``FastNumericArrayConverter`` analog
    (``element/unary_element_wise_operation.hpp:1061-1094``): two vector
    shifts on the packed int8 tile (split-halves layout, see
    ``composable_kernel_tpu.dtypes``).

Scale layouts (reference: client_example/30_gemm_bf16Aint8B and the group
stride trick at gemm_xdl_bf16_i8.cpp:28-56):

  - per-channel ``[N]``  — scale constant along K, so it commutes with the
    K-reduction and is applied ONCE on the accumulator in the epilogue
    (cheaper than CK's in-copy multiply: O(M*N) instead of O(K*N)).
  - group-wise ``[K/g, N]`` — scale varies along K; each B tile is
    dequantized in VMEM before the dot (CK's structure exactly). The scale
    rows are pre-expanded on the host into one 8-row-aligned block per
    K-step (Mosaic requires sublane-divisible block shapes), so the kernel
    sees a plain ``(srb, bn)`` tile indexed by the K step.
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
    _ceil_mult,
    _interpret_default,
    pad_to,
    sublane_align,
)

__all__ = ["dequant_gemm"]

_SCALE_SUBLANES = 8  # f32 sublane tile


def _unpack_lo(packed):
    # low nibble, sign-extended. Mosaic has no i8 vector shifts, so widen to
    # i32 first (sign-extending) and shift there: (p << 28) >> 28.
    p = packed.astype(jnp.int32)
    return (p << 28) >> 28


def _unpack_hi(packed):
    # high nibble: arithmetic >> 4 of the sign-extended byte == floor(p/16)
    return packed.astype(jnp.int32) >> 4


def _dequant_tile(b_q, s_block, s_rows, compute_dtype, bk):
    """VMEM dequant of one [bk, bn] int tile against its s_rows scale rows."""
    b = b_q.astype(jnp.float32)
    if s_rows == 1:
        b = b * s_block[0:1]  # one group covers the whole tile
    else:
        s = s_block[0:s_rows]
        b = b.reshape(s_rows, bk // s_rows, -1) * s[:, None, :]
        b = b.reshape(bk, -1)
    return b.astype(compute_dtype)


def _expand_group_scales(scales_p, row_starts, s_rows):
    """[G, Np] -> [n_steps * srb, Np]: per-K-step scale blocks, 8-row padded.

    Row block ``i`` holds scale rows [row_starts[i], row_starts[i]+s_rows);
    pad rows repeat row 0 (never read — the kernel slices [:s_rows]).
    """
    idx, srb = indexing.group_scale_row_table(
        row_starts, s_rows, sublanes=_SCALE_SUBLANES
    )
    return jnp.take(scales_p, jnp.asarray(idx), axis=0), srb


def _kernel_i8(
    a_ref, b_ref, s_ref, *rest, n_ds, acc_dtype, c_op, n_k_steps,
    per_channel, compute_dtype, bk, s_rows,
):
    """Grid = (m, n, k). int8 B. rest = (*ds, out, acc_scratch)."""
    d_refs = rest[:n_ds]
    out_ref = rest[n_ds]
    acc_ref = rest[n_ds + 1]
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a_tile = a_ref[...]
    if per_channel:
        # dequant deferred to epilogue: int8 -> compute dtype only
        b_tile = b_ref[...].astype(compute_dtype)
    else:
        b_tile = _dequant_tile(b_ref[...], s_ref[...], s_rows, compute_dtype, bk)
    acc_ref[...] += jnp.dot(a_tile, b_tile, preferred_element_type=acc_dtype)

    @pl.when(k_idx == n_k_steps - 1)
    def _finish():
        acc = acc_ref[...]
        if per_channel:
            acc = acc * s_ref[...]  # [1, bn] f32 broadcast over rows
        if c_op is not None:
            acc = c_op(acc, *[d[...] for d in d_refs])
        out_ref[...] = acc.astype(out_ref.dtype)


def _kernel_i4(
    a_lo_ref, a_hi_ref, b_ref, s_lo_ref, s_hi_ref, *rest,
    n_ds, acc_dtype, c_op, n_k_steps, per_channel, compute_dtype, bpk, s_rows,
    and_unpack=False,
):
    """Packed-int4 B: each byte holds W[k] (lo nibble) and W[k + K/2] (hi).

    One grid K-step consumes bpk packed rows and performs TWO dots: the low
    nibbles against A columns [k0, k0+bpk) and the high nibbles against A
    columns [K/2 + k0, ...). The split-halves pack layout makes both unpacks
    shift-only (no cross-sublane interleave).

    ``and_unpack``: B uses the ``pack_int4_w4a8`` offset-binary layout, so
    extraction is pure int8 ops — lo: (p & 0x0F) - 8 == w exactly; hi:
    p & 0xF0 == 16*w with the /16 pre-folded into the hi scale rows
    (group-wise) or applied on the f32 convert (per-channel). This removes
    the i32 widen + two-shift chain of the legacy pack (Mosaic has no i8
    vector shifts) — the measured VPU-convert roof of the decode regime.
    """
    d_refs = rest[:n_ds]
    out_ref = rest[n_ds]
    acc_ref = rest[n_ds + 1]
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = b_ref[...]
    if and_unpack:
        # Mosaic has no i8 vector shifts OR subtracts: extract with ANDs
        # and take the +8 offset out on the f32 side (fused into the
        # convert chain), keeping every pre-convert op at 1-byte width
        lo8 = packed & jnp.int8(0x0F)        # w_lo + 8, in [0, 15]
        hi = packed & jnp.int8(-16)          # 16 * w_hi, sign preserved
    else:
        lo = _unpack_lo(packed)
        hi = _unpack_hi(packed)
    if per_channel:
        if and_unpack:
            b_lo = (lo8.astype(jnp.float32) - 8.0).astype(compute_dtype)
            b_hi = (hi.astype(jnp.float32) * 0.0625).astype(compute_dtype)
        else:
            b_lo = lo.astype(compute_dtype)
            b_hi = hi.astype(compute_dtype)
    else:
        # group-wise: and_unpack hi scale rows are pre-divided by 16
        if and_unpack:
            b_lo = _dequant_tile(
                lo8.astype(jnp.float32) - 8.0, s_lo_ref[...], s_rows,
                compute_dtype, bpk,
            )
        else:
            b_lo = _dequant_tile(lo, s_lo_ref[...], s_rows, compute_dtype, bpk)
        b_hi = _dequant_tile(hi, s_hi_ref[...], s_rows, compute_dtype, bpk)
    acc_ref[...] += jnp.dot(a_lo_ref[...], b_lo, preferred_element_type=acc_dtype)
    acc_ref[...] += jnp.dot(a_hi_ref[...], b_hi, preferred_element_type=acc_dtype)

    @pl.when(k_idx == n_k_steps - 1)
    def _finish():
        acc = acc_ref[...]
        if per_channel:
            acc = acc * s_lo_ref[...]
        if c_op is not None:
            acc = c_op(acc, *[d[...] for d in d_refs])
        out_ref[...] = acc.astype(out_ref.dtype)


def dequant_gemm(
    a,
    b_q,
    scales=None,
    ds=(),
    *,
    group_size: int | None = None,
    packed_int4: bool = False,
    pack_blocks: int = 1,
    pack_layout: str = "legacy",  # "legacy" (pack_int4) | "w4a8" (AND-only)
    config: GemmConfig | None = None,
    c_op=None,
    out_dtype=None,
    interpret: bool | None = None,
):
    """C[M, N] = c_op(A @ (convert(B_q) * scales), *Ds) with in-kernel dequant.

    a:      [M, K] fp32/bf16/fp16 activations
    b_q:    [K, N] int8, or [K//2, N] int8 holding packed int4 pairs
            (``dtypes.pack_int4`` split-halves layout; ``pack_blocks`` > 1
            for the TP row-block layout) when ``packed_int4`` — OR a
            :class:`~composable_kernel_tpu.ops.quant.prepared.PreparedWeights`
            from ``prepare_wo_quant`` (the serving fast path: no per-call
            weight padding or scale expansion)
    scales: [N] f32 per-channel, or [K//group_size, N] f32 group-wise
    ds:     extra epilogue operands ([M, N] or [N]), per CK multiple-D
    """
    from composable_kernel_tpu.ops.quant.prepared import PreparedWeights

    prepared = b_q if isinstance(b_q, PreparedWeights) else None
    if prepared is not None:
        assert prepared.kind in ("w4a16", "w8a16"), prepared.kind
        assert scales is None and group_size is None and pack_blocks == 1
        per_chan_prep = prepared.group_size is None
        mismatch = config is not None and (
            config.block_n != prepared.bn or config.block_k != prepared.bk
        )
        if mismatch or (config is None and a.shape[0] > 64):
            out = dequant_gemm(
                a, prepared.b_p,
                prepared.scales_p[0] if per_chan_prep else prepared.scales_p,
                ds, group_size=prepared.group_size,
                packed_int4=prepared.kind == "w4a16",
                pack_blocks=prepared.pack_blocks, config=config, c_op=c_op,
                out_dtype=out_dtype, interpret=interpret,
            )
            return out[:, : prepared.n] if out.shape[1] != prepared.n else out
        b_q = prepared.b_p
        scales = prepared.scales_p[0] if per_chan_prep else prepared.scales_p
        group_size = prepared.group_size
        packed_int4 = prepared.kind == "w4a16"
        pack_blocks = prepared.pack_blocks
    m, k_a = a.shape
    kb, n = b_q.shape
    k = kb * 2 if packed_int4 else kb
    assert k == k_a, f"K mismatch: A has {k_a}, B implies {k}"
    per_channel = group_size is None
    if per_channel:
        assert scales.shape == (n,), scales.shape
    else:
        assert k % group_size == 0
        assert scales.shape == (k // group_size, n), scales.shape
        if packed_int4:
            # every packed row pair (k, k + K/2) must have well-defined groups
            assert (k // 2) % group_size == 0 or group_size % (k // 2) == 0
    if out_dtype is None:
        out_dtype = a.dtype
    if interpret is None:
        interpret = _interpret_default()
    compute_dtype = a.dtype if jnp.dtype(a.dtype).itemsize == 2 else jnp.float32
    scales = jnp.asarray(scales, jnp.float32)

    if config is None:
        if prepared is not None:
            config = prepared.decode_config(m)
        else:
            # measured-default blocks (the generic GemmConfig() default
            # costs 2x at e.g. M=N=K=1024: 78 vs 157 TF) — lazy import,
            # api imports us
            from composable_kernel_tpu.ops.quant.api import _heuristic_config

            config = _heuristic_config(m, n, k)
    cfg = config.shrink_to(m, n, k)
    m_align = max(sublane_align(a.dtype), 8)
    bm = max(m_align, -(-cfg.block_m // m_align) * m_align)
    bn = max(128, -(-cfg.block_n // 128) * 128)
    bm = min(bm, _ceil_mult(m, m_align))
    bn = min(bn, _ceil_mult(n, 128))
    # K blocking: int8 sublane tile is 32; group-wise needs bk|group or group|bk.
    bk = max(256, -(-cfg.block_k // 256) * 256)
    if not per_channel:
        if bk >= group_size:
            bk = (bk // group_size) * group_size
        else:
            bk = group_size  # keep one-scale-row-per-tile the common case
    half_k = k // 2 if packed_int4 else None
    if packed_int4:
        assert k % (2 * pack_blocks) == 0
        half_seg = k // (2 * pack_blocks)  # packed rows per segment
        bpk = indexing.fit_packed_block(
            bk // 2 if bk // 2 >= 128 else bk,
            half_seg,
            None if per_channel else group_size,
        )
        assert half_seg % bpk == 0, (
            f"packed segment {half_seg} must be divisible by packed block {bpk}"
        )
        n_k_steps = half_k // bpk
    else:
        bk = min(bk, _ceil_mult(k, 256))
        n_k_steps = -(-k // bk)

    # ---- pad operands to block multiples --------------------------------
    b_p = pad_to(b_q, (None if packed_int4 else bk, bn))
    if not packed_int4:
        kp = b_p.shape[0]
        a_p = pad_to(a, (bm, bk))
        if a_p.shape[1] != kp:
            a_p = jnp.pad(a_p, ((0, 0), (0, kp - a_p.shape[1])))
    else:
        a_p = pad_to(a, (bm, None))
    np_ = b_p.shape[1]
    mp = a_p.shape[0]

    # ---- scale layout ---------------------------------------------------
    gsz = group_size
    if per_channel:
        s_rows = 1
        s_lo = pad_to(scales.reshape(1, -1), (None, bn))
        s_hi = s_lo
        scale_spec = pl.BlockSpec(
            (1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM
        )
        scale_hi_spec = scale_spec
        srb = 1
    else:
        blk = bpk if packed_int4 else bk
        s_rows = max(1, blk // gsz)
        if prepared is not None:
            assert bn == prepared.bn and blk == (
                prepared.bpk if packed_int4 else prepared.bk
            ), ((bn, blk), (prepared.bn, prepared.bpk, prepared.bk))
            s_lo, s_hi, srb = prepared.s_lo, prepared.s_hi, prepared.srb
        elif packed_int4:
            # scale-row starts for each step's lo/hi nibbles, honoring the
            # segmented (tensor-parallel) pack layout; the AND-only layout
            # pre-folds the hi nibble's x16 into its scale rows
            s_p = pad_to(scales, (None, bn))
            lo_starts, hi_starts = indexing.split_halves_scale_starts(
                n_k_steps, bpk, half_seg, gsz
            )
            s_lo, srb = _expand_group_scales(s_p, lo_starts, s_rows)
            s_hi_src = s_p * (1.0 / 16.0) if pack_layout == "w4a8" else s_p
            s_hi, _ = _expand_group_scales(s_hi_src, hi_starts, s_rows)
        else:
            s_p = pad_to(scales, (None, bn))
            lo_starts = [(i * blk) // gsz for i in range(n_k_steps)]
            s_lo, srb = _expand_group_scales(s_p, lo_starts, s_rows)
            s_hi = s_lo
        scale_spec = pl.BlockSpec(
            (srb, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
        )
        scale_hi_spec = scale_spec

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

    grid = (mp // bm, np_ // bn, n_k_steps)
    acc_dtype = jnp.float32
    out_shape = jax.ShapeDtypeStruct((mp, np_), out_dtype)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM)

    flops = 2 * mp * np_ * k
    bytes_accessed = int(
        mp * k * a_p.dtype.itemsize + kb * np_ + s_lo.size * 4
        + mp * np_ * jnp.dtype(out_dtype).itemsize
    )
    cost = pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed, transcendentals=0)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        # opt-in scoped-VMEM raise (see GemmConfig.vmem_limit_mb: required
        # for whole-N decode blocks, harmful on MXU-bound prefill shapes)
        vmem_limit_bytes=(
            cfg.vmem_limit_mb * 1024 * 1024 if cfg.vmem_limit_mb else None
        ),
    )

    if not packed_int4:
        kernel = functools.partial(
            _kernel_i8,
            n_ds=len(ds_p), acc_dtype=acc_dtype, c_op=c_op, n_k_steps=n_k_steps,
            per_channel=per_channel, compute_dtype=compute_dtype, bk=bk,
            s_rows=s_rows,
        )
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                    scale_spec,
                    *d_specs,
                ],
                out_specs=out_spec,
                scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
            ),
            compiler_params=cparams,
            cost_estimate=cost,
            interpret=interpret,
        )(a_p, b_p, s_lo, *ds_p)
    else:
        kernel = functools.partial(
            _kernel_i4,
            n_ds=len(ds_p), acc_dtype=acc_dtype, c_op=c_op, n_k_steps=n_k_steps,
            per_channel=per_channel, compute_dtype=compute_dtype, bpk=bpk,
            s_rows=s_rows, and_unpack=pack_layout == "w4a8",
        )
        out = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=grid,
                in_specs=[
                    # A columns for the step's lo / hi nibbles: segment-aware
                    # (indexing.split_halves_a_block, unit-tested directly)
                    pl.BlockSpec(
                        (bm, bpk),
                        lambda i, j, kk: (
                            i,
                            indexing.split_halves_a_block(
                                kk, bpk, half_seg, hi=False
                            ),
                        ),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (bm, bpk),
                        lambda i, j, kk: (
                            i,
                            indexing.split_halves_a_block(
                                kk, bpk, half_seg, hi=True
                            ),
                        ),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec((bpk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
                    scale_spec,
                    scale_hi_spec,
                    *d_specs,
                ],
                out_specs=out_spec,
                scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
            ),
            compiler_params=cparams,
            cost_estimate=cost,
            interpret=interpret,
        )(a_p, a_p, b_p, s_lo, s_hi, *ds_p)

    n_true = prepared.n if prepared is not None else n
    if (mp, np_) != (m, n_true):
        out = out[:m, :n_true]
    return out
