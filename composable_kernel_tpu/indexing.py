"""Block-index algebra: the reusable index-map math shared by kernels.

CK analog: ``include/ck/tensor_description/`` — TensorDescriptor transforms
(multi_index_transform.hpp: Merge/UnMerge/Embed) compose into the index
arithmetic every gridwise kernel needs. On TPU the *lowering* belongs to
XLA/Mosaic, but the block-level index algebra (which block does grid step s
touch, which scale rows cover tile kk, where does logical row l live in a
packed layout) is still real math that multiple kernels share. This module
is that small library (SURVEY.md §2.1), with direct unit tests in
tests/test_indexing.py.

Contents:
  - clamped_block:        live-prefix KV DMA clamp (attention kernels)
  - split_halves_*:       the segmented int4 split-halves pack algebra
                          (quant GEMM lo/hi A-block maps + scale rows)
  - group_scale_row_table: group-scale row expansion for sublane-aligned
                          per-K-step scale blocks
  - ragged_step_table:    (m-tile, group, row-range) walk for arbitrary
                          group sizes (grouped GEMM)

A CK FastNumericArrayConverter analog (offset-binary nibbles + magic-or
bitcast unpack, element/unary_element_wise_operation.hpp:1061-1094) was
built, verified bit-exact, and measured SLOWER than the i32-widen chain on
v5e (495-545 -> 300-345 GB/s at decode shapes): every pltpu.bitcast that
changes element width is a sublane relayout, and the widen chain is already
at the VPU roof. Record + probes: scripts/probe_magic_unpack.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "clamped_block",
    "fit_packed_block",
    "split_halves_a_block",
    "split_halves_scale_starts",
    "group_scale_row_table",
    "ragged_step_table",
]


# ------------------------------------------------------------------ clamps


def clamped_block(kk, live_len, block):
    """Clamp block index ``kk`` to the live prefix of a ragged sequence.

    Blocks wholly past ``live_len`` re-read block 0's worth of data at the
    last live block instead of streaming dead rows from HBM (they are fully
    masked in-kernel, so only DMA traffic changes). Used by the attention
    K/V BlockSpec index maps (ops/attention/kernel.py).
    """
    n_live = jax.lax.div(live_len + (block - 1), block)
    return jnp.minimum(kk, jnp.maximum(n_live - 1, 0))


def clamped_parity_block(kk, sub, live_len, block, stride):
    """Clamp a strided sub-operand's block index to the live prefix.

    Sub-operand ``sub`` of a ``stride``-wide bundle reads tile
    ``kk*stride + sub`` of ``block`` rows. Dead tiles park at the LARGEST
    live tile of the SAME residue class (index unchanged from the
    sub-operand's previous step -> Pallas skips the re-fetch entirely),
    or at tile ``sub`` when no live tile of that class exists. This is
    what makes multi-sub-operand KV streaming (ops/attention/paged.py
    ``kv_subs``) read only ceil(live_len/block) tiles while issuing
    ``stride`` concurrent DMAs per grid step — the measured v5e DMA rate
    at one 2048-row stream is ~438 GB/s vs ~624 at four 256-row streams
    (scripts/probe_kv_dma.py).
    """
    tile = kk * stride + sub
    last_live = jnp.maximum(
        jax.lax.div(live_len + (block - 1), block) - 1, 0
    )
    # largest tile == sub (mod stride) that is <= last_live; tile `sub`
    # itself when the class has no live tile (floor-div of the clamped
    # non-negative gap keeps the arithmetic sign-safe)
    park = sub + jax.lax.div(
        jnp.maximum(last_live - sub, 0), stride
    ) * stride
    return jnp.where(tile <= last_live, tile, park)


def fit_packed_block(target, half_seg, group_size=1, lane=128):
    """Largest packed K-block <= ``target`` that (a) divides ``half_seg``,
    (b) is a whole number of scale groups when groups fit inside the half
    segment, and (c) stays lane-aligned for the A-tile BlockSpec.

    Handles half segments whose group count is not a power of two (e.g.
    K=11008: half_seg=5504=43*128 -> block 128), which a round-to-target
    choice would reject. CK analog: KPerBlock selection in the instance
    tables + the MatrixPadder divisibility checks.
    """
    import math

    unit = group_size if group_size and half_seg % group_size == 0 else 1
    base = unit * lane // math.gcd(unit, lane)
    if half_seg % base != 0:
        base = unit  # misaligned halves: caller's asserts surface the misfit
    n = half_seg // base
    best = 1
    for d in range(1, n + 1):
        if n % d == 0 and d * base <= max(target, base):
            best = d
    return best * base


def snap_divisor_bn(n: int, target: int, lane: int = 128) -> int:
    """Snap a decode N-block to a lane-multiple DIVISOR of ``n``.

    A non-dividing block forces ``pad_to`` on the weight matrix at call
    time; with weights flowing through jit/scan as *arguments* XLA does not
    hoist that pad out of the decode loop, so every step pays a full HBM
    copy of the weights (measured: 375 vs 663 GB/s at M=8 K=4096 N=11008).
    Preference: the smallest dividing block >= target (bigger blocks keep
    the B stream contiguous); fallback the largest one below; ``target``
    unchanged when n is not lane-aligned (the caller pads once via
    ``ops.quant.prepared``). CK analog: the GemmSpecialization M/N/KPadding
    dispatch — CK templates on whether padding is needed at all
    (gridwise_gemm_pipeline_selector + MatrixPadder), because the padded
    path is known slower; here the pad is avoidable by block choice.
    """
    if n % lane != 0 or target >= n:
        return target
    units = n // lane
    above, below = None, None
    for d in range(1, units + 1):
        if units % d:
            continue
        bn = d * lane
        if bn >= target:
            above = bn if above is None else min(above, bn)
        else:
            below = bn if below is None else max(below, bn)
    # accept a dividing block only within sane bounds: <= 2x the tuned
    # target and <= 14336 (wider dequant tiles degrade past ~12k, see
    # _decode_bn); otherwise keep the target — the caller pads once via
    # ops.quant.prepared (e.g. vocab-sized lm_head, N=128256)
    if above is not None and above <= 2 * target and above <= 14336:
        return above
    if below is not None and below * 2 >= target:
        return below
    return target


# ------------------------------------------ split-halves int4 pack algebra
#
# dtypes.pack_int4 stores logical K-rows (k, k + K/2) in one byte (lo, hi
# nibble); with ``pack_blocks`` > 1 the K axis splits into B independent
# segments (the tensor-parallel layout). One kernel K-step consumes ``bpk``
# packed rows; its lo nibbles cover logical rows [seg_base + off, ...+bpk)
# and its hi nibbles the same range shifted by half_seg.


def split_halves_a_block(kk, bpk, half_seg, hi):
    """A-matrix K-block index for packed step ``kk`` (lo or hi nibbles).

    half_seg: packed rows per segment (K // (2 * pack_blocks)).
    Returns the block index in units of ``bpk`` logical columns.
    """
    p0 = kk * bpk
    seg_base = (p0 // half_seg) * (2 * half_seg)
    off = p0 % half_seg
    if hi:
        off = off + half_seg
    return (seg_base + off) // bpk


def split_halves_scale_starts(n_k_steps, bpk, half_seg, group_size):
    """Host-side logical scale-row starts for each packed K-step (lo, hi)."""
    lo_rows, hi_rows = [], []
    for i in range(n_k_steps):
        p0 = i * bpk
        seg, off = p0 // half_seg, p0 % half_seg
        lo_rows.append((seg * 2 * half_seg + off) // group_size)
        hi_rows.append((seg * 2 * half_seg + half_seg + off) // group_size)
    return lo_rows, hi_rows


def group_scale_row_table(row_starts, s_rows, sublanes=8):
    """[G, N] scale rows -> gather index list giving one ``srb``-row
    (sublane-aligned) block per K-step; pad rows repeat row 0 (never read).

    Returns (index array, srb).
    """
    srb = -(-max(s_rows, 1) // sublanes) * sublanes
    idx = []
    for r0 in row_starts:
        rows = list(range(r0, r0 + s_rows))
        rows += [0] * (srb - s_rows)
        idx.extend(rows)
    return np.asarray(idx, np.int32), srb


# ------------------------------------------------------ ragged group walk


def ragged_step_table(group_sizes, n_m_tiles, bm, g, mp):
    """Device-side step table (CK GroupedGemmKernelArgument analog).

    Returns int32 [4, n_steps]: m-tile index, group id, within-tile row
    range [lo, hi) owned by that group. Steps are sorted by (tile, group) so
    each output tile is visited by consecutive steps. Padding steps (past
    the true count) are parked on the LAST tile/group with lo == hi == 0 so
    the resident output block's index never changes after the final live
    step. Trailing rows (sum(sizes) < mp) ride with the last group.
    """
    sizes = jnp.asarray(group_sizes, jnp.int32)
    ends = jnp.cumsum(sizes)
    starts = ends - sizes
    ends = ends.at[g - 1].set(jnp.maximum(ends[g - 1], mp))

    first_tile = starts // bm
    last_tile = jnp.maximum((ends - 1) // bm, first_tile - 1)  # empty: 0
    counts = jnp.maximum(last_tile - first_tile + 1, 0)
    off = jnp.cumsum(counts) - counts

    n_steps = n_m_tiles + g - 1
    s_idx = jnp.arange(n_steps, dtype=jnp.int32)
    gid = jnp.clip(
        jnp.searchsorted(off, s_idx, side="right").astype(jnp.int32) - 1,
        0, g - 1,
    )
    total = off[g - 1] + counts[g - 1]
    alive = s_idx < total
    tile = first_tile[gid] + (s_idx - off[gid])
    tile = jnp.where(alive, jnp.clip(tile, 0, n_m_tiles - 1), n_m_tiles - 1)
    lo = jnp.clip(starts[gid] - tile * bm, 0, bm)
    hi = jnp.clip(ends[gid] - tile * bm, 0, bm)
    lo = jnp.where(alive, lo, 0)
    hi = jnp.where(alive, hi, 0)
    return jnp.stack(
        [tile, jnp.where(alive, gid, g - 1), lo, hi]
    ).astype(jnp.int32)
