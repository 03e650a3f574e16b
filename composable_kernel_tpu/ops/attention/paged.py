"""Paged (block-table) KV-cache attention.

The reference snapshot has no paged KV (SURVEY.md §2.5: "no paged/
block-table KV in this snapshot" — it landed in later CK releases as the
fmha splitkv page-block trait). This is the TPU-native design: the KV
cache is a global pool of fixed-size pages and each sequence owns a list
of page ids (the block table). The Pallas kernel never gathers pages into
a contiguous buffer — the *BlockSpec index map* reads the block table from
scalar-prefetch SMEM and DMAs each page directly from its pool slot, so
page indirection costs zero extra HBM traffic (same trick as the
clamped-KV decode maps, indexing.clamped_block).

Layout: pools are [P, Hkv, page, D] (page rows innermost so one page DMA
is one contiguous [page, D] tile per head, and the block's trailing dims
satisfy Mosaic's (8,128) tiling rule); block tables [B, max_pages] int32;
sequence lengths [B] int32. Pages past a sequence's live length are masked AND
their DMAs redirected to page 0.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.attention.config import AttentionConfig
from composable_kernel_tpu.ops.gemm.kernel import _ceil_mult, _interpret_default, pad_to

__all__ = ["paged_flash_decode", "PagedKVCache"]

_NEG_INF = -1e30
_LANES = 128


def _fused_heads_default(hkv: int) -> bool:
    """Default head strategy: the block-diagonal fused step wins whenever
    several kv heads share a block DMA (the per-head loop is MXU-issue
    bound, not FLOP bound); a single kv head has nothing to fuse."""
    return hkv > 1


def _paged_kernel(
    table_ref,  # [B, max_pages] int32 scalar prefetch
    lens_ref,  # [1, B] int32 scalar prefetch
    q_ref,  # [1, Hq*Sq(pad), D] — ALL heads of one sequence
    *rest,  # kv_subs k refs + kv_subs v refs ([1, Hkv, page/kv_subs, D]
    #         sub-tiles of the grid step's page span), then
    #         [k_scale_ref, v_scale_ref,] [kn_ref, vn_ref,] o_ref, scratches
    scale: float,
    page: int,
    n_steps: int,
    n_kv_heads: int,
    rows_per_kv: int,  # group * Sq query rows share one kv head
    has_kv_scale: bool = False,
    window: int | None = None,
    causal_sq: int = 1,
    has_new: bool = False,
    rows_live: int | None = None,
    fused_heads: bool = False,
    kv_subs: int = 1,
):
    """Grid = (B, pages): each page is DMA'd exactly once and serves every
    head — the bandwidth-shaped layout for decode, where KV streaming is
    the whole cost and per-(head, page) grids would re-read each page
    `group` times (measured 3.4x slower).

    ``causal_sq > 1``: the Sq queries sit at positions lens-Sq .. lens-1
    and query i attends keys <= lens-Sq+i (in-chunk causality — the
    speculative verify step over page pools). Query rows are laid out
    (group, Sq) per kv head, so row r's chunk index is r % Sq.

    ``has_new``: the deferred-append decode path — ``lens`` counts only
    the OLD cache rows; the fresh token's K/V ride separate [1, Hkv, 8, D]
    VMEM operands and fold into the online softmax at the last grid step,
    so the decode step never waits on a per-layer cache write (the
    slab rewrites replay back-to-back at step end instead)."""
    assert kv_subs == 1 or fused_heads, "kv_subs>1 requires the fused step"
    k_refs = rest[:kv_subs]
    v_refs = rest[kv_subs : 2 * kv_subs]
    idx = 2 * kv_subs
    if has_kv_scale:
        k_scale_ref = rest[idx]; idx += 1
        v_scale_ref = rest[idx]; idx += 1
    if has_new:
        kn_ref = rest[idx]; idx += 1
        vn_ref = rest[idx]; idx += 1
    o_ref, m_scr, l_scr, acc_scr = rest[idx : idx + 4]
    bs = page // kv_subs  # rows per sub-tile
    kk = pl.program_id(1)
    batch = pl.program_id(0)
    # newest query position: with a deferred fresh token the live length is
    # lens + 1 and the window/liveness bounds shift by one
    newest_off = 1 if has_new else 0

    @pl.when(kk == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    live = kk * page < lens_ref[0, batch]
    if window is not None:
        # sliding window: the newest query sits at lens-1 and attends keys
        # in (lens-1-window, lens-1]; whole blocks before that are dead —
        # the rolling-window bandwidth saving without a rolling buffer.
        # With a multi-query chunk the OLDEST query (at lens-Sq) reaches
        # furthest back, so liveness uses its lower bound.
        live &= (kk * page + page - 1
                 > lens_ref[0, batch] - causal_sq - window + newest_off)

    def _fused_sub(t):
        # Block-diagonal fused-heads sub-step: ONE MXU dot computes every
        # head's scores — Q_all [Hkv*rows, D] @ (K sub-tile reshaped
        # [Hkv*bs, D])^T — with cross-head entries masked to -inf so
        # exp() zeroes them EXACTLY, which makes the single
        # P_all @ V_all dot exact too (the zero rows of P kill the
        # cross-head products). Trades 2 large MXU issues for the
        # per-head loop's 2*Hkv small ones plus Hkv online-softmax
        # chains: the decode grid is issue/sequencing bound, not
        # FLOP bound (docs/performance.md round-4; the per-head loop
        # measured 54 us/layer vs a ~22 us DMA floor at B=8 GQA 32/8).
        # With kv_subs > 1 the page span is split into sub-operands so
        # Mosaic issues 2*kv_subs concurrent KV DMAs per step (the v5e
        # DMA engine needs ~4+ streams for peak rate —
        # scripts/probe_kv_dma.py) and dead tails clamp at bs granularity
        # (indexing.clamped_parity_block). CK analog: the persistent
        # tile-loop amortization idea of
        # device_grouped_gemm_tile_loop.hpp:26-95, applied to the MXU
        # issue and DMA streams instead of thread blocks.
        rows_tot = n_kv_heads * rows_per_kv
        cols_tot = n_kv_heads * bs
        pos0 = kk * page + t * bs  # global key position of sub col 0
        q_all = q_ref[0]  # [rows_tot, D]
        k_all = k_refs[t][0].reshape(cols_tot, k_refs[t].shape[-1]).astype(
            q_all.dtype
        )
        v_all = v_refs[t][0].reshape(cols_tot, v_refs[t].shape[-1]).astype(
            q_all.dtype
        )
        s = jax.lax.dot_general(
            q_all, k_all, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows_tot, cols_tot]
        if has_kv_scale:
            # per-head k scale as a [rows_tot, 1] column (SMEM loads
            # are scalar-only: build from Hkv scalars once per step)
            s_col = jnp.concatenate(
                [
                    jnp.full((rows_per_kv, 1),
                             scale * k_scale_ref[0, 0, h], jnp.float32)
                    for h in range(n_kv_heads)
                ],
                axis=0,
            )
            s = s * s_col
        else:
            s = s * scale
        r = jax.lax.broadcasted_iota(jnp.int32, (rows_tot, cols_tot), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows_tot, cols_tot), 1)
        ch = c // bs
        k_pos = pos0 + (c - ch * bs)
        mask = (r // rows_per_kv) == ch  # block-diagonal head match
        if causal_sq > 1:
            r_loc = r - (r // rows_per_kv) * rows_per_kv
            q_pos = (lens_ref[0, batch] - causal_sq
                     + jax.lax.rem(r_loc, causal_sq))
            mask &= k_pos <= q_pos
            if window is not None:
                mask &= k_pos > q_pos - window
        else:
            mask &= k_pos < lens_ref[0, batch]
            if window is not None:
                mask &= k_pos > (lens_ref[0, batch] - 1 - window
                                 + newest_off)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[...]
        row_max = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, row_max)
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :1])
        l_scr[...] = l_scr[...] * corr + jnp.sum(p, axis=-1,
                                                 keepdims=True)
        m_scr[...] = m_new
        acc_scr[...] = acc_scr[...] * corr[:, :1] + jax.lax.dot_general(
            p.astype(v_all.dtype), v_all, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if fused_heads:
        for t in range(kv_subs):
            sub_live = kk * page + t * bs < lens_ref[0, batch]
            if window is not None:
                sub_live &= (kk * page + (t + 1) * bs - 1
                             > lens_ref[0, batch] - causal_sq - window
                             + newest_off)
            pl.when(sub_live)(functools.partial(_fused_sub, t))

    @pl.when(live & jnp.bool_(not fused_heads))
    def _step():
        if fused_heads:
            return  # static: body compiled out; the fused subs ran above
        k_ref, v_ref = k_refs[0], v_refs[0]
        # mask geometry is head-independent: compute once per step
        shape = (rows_per_kv, page)
        k_pos = kk * page + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        if causal_sq > 1:
            # per-query position: row r (group-major) is chunk query
            # r % Sq, sitting at lens - Sq + (r % Sq). Padded rows get
            # a garbage mask; their outputs are sliced off.
            r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            q_pos = lens_ref[0, batch] - causal_sq + (r % causal_sq)
            mask = k_pos <= q_pos
            if window is not None:
                mask &= k_pos > q_pos - window
        else:
            mask = k_pos < lens_ref[0, batch]
            if window is not None:
                mask &= k_pos > lens_ref[0, batch] - 1 - window + newest_off
        for h in range(n_kv_heads):
            rows = slice(h * rows_per_kv, (h + 1) * rows_per_kv)
            q = q_ref[0, rows, :]  # [rows_per_kv, D]
            # int8 cache: ONE convert per tile; the per-head k scale folds
            # into the scalar s multiply and the v scale into the finish
            # epilogue (linearity) — the old dequant chain re-walked every
            # KV byte 3x on the VPU per head per step, the decode kernel's
            # dominant cost at GQA sizes.
            k = k_ref[0, h].astype(q.dtype)  # [page, D]
            v = v_ref[0, h].astype(q.dtype)
            s_mul = (scale * k_scale_ref[0, 0, h]) if has_kv_scale else scale
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * s_mul  # [rows_per_kv, page]
            s = jnp.where(mask, s, _NEG_INF)

            m_prev = m_scr[rows, :]
            row_max = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, row_max)
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(s - m_new[:, :1])
            l_scr[rows, :] = l_scr[rows, :] * corr + jnp.sum(
                p, axis=-1, keepdims=True
            )
            m_scr[rows, :] = m_new
            acc_scr[rows, :] = acc_scr[rows, :] * corr[:, :1] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(kk == n_steps - 1)
    def _finish():
        if has_new:  # noqa: B023 (static python flag)
            # fold the fresh token in-VMEM: one extra online-softmax column
            # per head (an [rows, 1] dot on the VPU + a rank-1 acc update).
            # K/V arrive in the cache's storage domain (int8 when the cache
            # is quantized), so the result is bit-compatible with writing
            # the row first and reading it back.
            for h in range(n_kv_heads):
                rows = slice(h * rows_per_kv, (h + 1) * rows_per_kv)
                q = q_ref[0, rows, :].astype(jnp.float32)
                kn = kn_ref[0, h : h + 1, :].astype(jnp.float32)  # [1, D]
                vn = vn_ref[0, h : h + 1, :].astype(jnp.float32)
                s_mul = (scale * k_scale_ref[0, 0, h]) if has_kv_scale else scale
                s_new = jnp.sum(q * kn, axis=-1, keepdims=True) * s_mul
                m_prev = m_scr[rows, :]
                m_new = jnp.maximum(m_prev, s_new)
                corr = jnp.exp(m_prev - m_new)
                p_new = jnp.exp(s_new - m_new[:, :1])
                l_scr[rows, :] = l_scr[rows, :] * corr + p_new
                m_scr[rows, :] = m_new
                acc_scr[rows, :] = (
                    acc_scr[rows, :] * corr[:, :1] + p_new * vn
                )
        l = l_scr[...][:, :1]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        if rows_live is not None:
            # flat output layout: only the live rows of each head group,
            # concatenated head-major — [Hkv*rows_live, D] = the [B, Hq*D]
            # 2-D layout the wo projection consumes, no pad/transpose glue
            parts = []
            for h in range(n_kv_heads):
                rows = slice(h * rows_per_kv, h * rows_per_kv + rows_live)
                o_h = acc_scr[rows, :] / l_safe[rows]
                if has_kv_scale:
                    o_h = o_h * v_scale_ref[0, 0, h]
                parts.append(o_h)
            o_ref[0] = jnp.concatenate(parts, axis=0).astype(o_ref.dtype)
        elif has_kv_scale:
            # deferred per-head v scale (exact: constant along the summed
            # key axis, and the int8->bf16 v convert is lossless); SMEM
            # loads are scalar-only, so apply per head slice
            for h in range(n_kv_heads):
                rows = slice(h * rows_per_kv, (h + 1) * rows_per_kv)
                o_h = acc_scr[rows, :] / l_safe[rows] * v_scale_ref[0, 0, h]
                o_ref[0, rows, :] = o_h.astype(o_ref.dtype)
        else:
            o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def paged_flash_decode(
    q,
    k_pool,
    v_pool,
    block_table,
    seq_lens,
    *,
    k_scale=None,
    v_scale=None,
    k_new=None,
    v_new=None,
    window: int | None = None,
    causal: bool = False,
    scale: float | None = None,
    config: AttentionConfig | None = None,
    out_dtype=None,
    q_packed: tuple | None = None,
    out_layout: str = "bhsd",
    fused_heads: bool | None = None,
    interpret: bool | None = None,
):
    """Decode attention over a paged KV pool.

    q:           [B, Hq, Sq, D] (Sq small; queries attend all live keys —
                 or, with ``causal=True``, query i sits at position
                 lens-Sq+i and attends keys <= its own position: the
                 speculative verify step over page pools).
    k/v_pool:    [P, Hkv, page, D] global page pools (int8 with
                 ``k_scale``/``v_scale`` [B, Hkv] f32 per-sequence scales).
    block_table: [B, max_pages] int32 — page ids per sequence, in order.
                 Entries past the live length are ignored (any value).
    seq_lens:    [B] int32 live key counts.
    k_new/v_new: optional [B, Hkv, 1, D] deferred fresh-token rows (pool
                 storage dtype; requires sq == 1) — folded into the online
                 softmax in-VMEM so the pool write can batch across layers
                 (back-to-back kv_cache_update_paged at step end). ``seq_lens``
                 then counts only rows already in the pool.
    q_packed/out_layout: as in :func:`decode_attention` — q already in
    the kernel's packed layout, and/or a flat [B, Hq*Dv] output (sq == 1).
    Returns [B, Hq, Sq, D] (or [B, Hq*Dv] when flat).
    """
    p_total, hkv, page, dv = v_pool.shape
    if q_packed is not None:
        assert q is None
        q_arr, hq = q_packed
        b = q_arr.shape[0]
        sq = 1
        d = k_pool.shape[-1]
    else:
        b, hq, sq, d = q.shape
    assert k_pool.shape == (p_total, hkv, page, d)
    assert hq % hkv == 0
    assert page % 128 == 0, f"page size {page} must be a lane multiple"
    group = hq // hkv
    max_pages = block_table.shape[1]
    assert out_layout in ("bhsd", "flat")
    flat_out = out_layout == "flat"
    if flat_out:
        assert sq == 1, "flat output layout is per-token decode only"
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    if out_dtype is None:
        qd = (q if q_packed is None else q_packed[0]).dtype
        out_dtype = qd
    has_kv_scale = k_scale is not None
    if has_kv_scale:
        assert v_scale is not None and k_scale.shape == (b, hkv)
    has_new = k_new is not None
    if has_new:
        assert v_new is not None and sq == 1 and not causal
        if k_new.ndim == 4:
            k_new = k_new.reshape(b, hkv, d)
            v_new = v_new.reshape(b, hkv, dv)
        assert k_new.shape == (b, hkv, d) and v_new.shape[:2] == (b, hkv)

    dp = _ceil_mult(d, _LANES)
    dvp = _ceil_mult(dv, _LANES)
    # pack queries [B, Hkv, group*Sq(pad to sublanes), D]: each kv head's
    # sharers are contiguous rows, so the kernel's per-head scratch slices
    # stay sublane-aligned
    rows = group * sq
    rows_pad = _ceil_mult(rows, 8)
    if q_packed is not None:
        assert q_arr.shape == (b, hkv * rows_pad, dp), (
            q_arr.shape, (b, hkv * rows_pad, dp)
        )
        q_p = q_arr
    else:
        q_r = q.reshape(b, hkv, rows, d)
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, rows_pad - rows), (0, dp - d)))
        q_p = q_r.reshape(b, hkv * rows_pad, dp)
    k_p = pad_to(k_pool, (None, None, None, dp))
    v_p = pad_to(v_pool, (None, None, None, dvp))

    table = jnp.asarray(block_table, jnp.int32)
    lens = jnp.asarray(seq_lens, jnp.int32).reshape(1, b)

    def q_index(batch, kk, *_):
        return (batch, 0, 0)

    def kv_index(batch, kk, table_s, lens_s):
        # dead pages (beyond the live prefix) re-read page table[b, 0]
        # so their DMAs stay in-bounds and cheap; the kernel masks them.
        live = kk * page < lens_s[0, batch]
        pg = table_s[batch, jnp.where(live, kk, 0)]
        return (pg, 0, 0, 0)

    in_specs = [
        pl.BlockSpec((1, hkv * rows_pad, dp), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hkv, page, dp), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, hkv, page, dvp), kv_index, memory_space=pltpu.VMEM),
    ]
    inputs = [q_p, k_p, v_p]
    if has_kv_scale:
        # [B, 1, Hkv] with a (1, 1, Hkv) block: trailing dims equal the
        # array dims, satisfying Mosaic's block rule (a (1, Hkv) block over
        # [B, Hkv] does not when B > 1)
        sc_spec = pl.BlockSpec(
            (1, 1, hkv), lambda batch, kk, *_: (batch, 0, 0),
            memory_space=pltpu.SMEM,
        )
        in_specs += [sc_spec, sc_spec]
        inputs += [
            jnp.asarray(k_scale, jnp.float32).reshape(-1, 1, hkv),
            jnp.asarray(v_scale, jnp.float32).reshape(-1, 1, hkv),
        ]
    if has_new:
        # [B, Hkv, D] 3-D layout: trailing block dims equal the array dims
        # (Mosaic's rule), so no row padding and no per-call jnp.pad
        in_specs += [
            pl.BlockSpec((1, hkv, dp), lambda batch, kk, *_: (batch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, dvp), lambda batch, kk, *_: (batch, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        kn3 = k_new.reshape(b, hkv, d)
        vn3 = v_new.reshape(b, hkv, dv)
        if dp != d:
            kn3 = jnp.pad(kn3, ((0, 0), (0, 0), (0, dp - d)))
        if dvp != dv:
            vn3 = jnp.pad(vn3, ((0, 0), (0, 0), (0, dvp - dv)))
        inputs += [kn3, vn3]

    if fused_heads is None:
        fused_heads = _fused_heads_default(hkv)
    kernel = functools.partial(
        _paged_kernel,
        scale=scale,
        page=page,
        n_steps=max_pages,
        n_kv_heads=hkv,
        rows_per_kv=rows_pad,
        has_kv_scale=has_kv_scale,
        window=window,
        causal_sq=sq if causal else 1,
        has_new=has_new,
        rows_live=rows if flat_out else None,
        fused_heads=fused_heads,
    )

    out_rows = hkv * rows if flat_out else hkv * rows_pad
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_rows, dvp), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, max_pages),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, out_rows, dvp), q_index,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((hkv * rows_pad, _LANES), jnp.float32),
                pltpu.VMEM((hkv * rows_pad, _LANES), jnp.float32),
                pltpu.VMEM((hkv * rows_pad, dvp), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(table, lens, *inputs)

    if flat_out:
        if dvp != dv:
            out = out[:, :, :dv]
        return out.reshape(b, hq * dv)
    out = out.reshape(b, hkv, rows_pad, dvp)[:, :, :rows, :dv]
    return out.reshape(b, hq, sq, dv)


def decode_attention(
    q,
    k,
    v,
    *,
    kv_seq_len=None,
    k_scale=None,
    v_scale=None,
    k_new=None,
    v_new=None,
    window: int | None = None,
    causal: bool = False,
    # default from the round-4 sweep (scripts/probe_decode_attn.py): the
    # kernel is grid-step-overhead bound (~1.1 us/step + call base), so
    # bk=1024 beats 512 (54 vs 71 us at B=8 GQA 32/8, prefix 1k) despite
    # reading more dead rows past a block boundary
    block_k: int = 1024,
    scale: float | None = None,
    out_dtype=None,
    q_packed: tuple | None = None,
    out_layout: str = "bhsd",
    fused_heads: bool | None = None,
    kv_subs: int | None = None,
    interpret: bool | None = None,
):
    """Head-grouped dense decode attention over a contiguous KV cache.

    Same single-stream structure as the paged kernel, without the table:
    grid (B, kv blocks) with all query heads resident, so each KV block is
    DMA'd once instead of once per query head (the [B*Hq, ...] flash grid
    re-fetches it per head: measured 3.6x slower at GQA 32/8 decode).
    Blocks past ``kv_seq_len`` clamp their DMA to block 0 and are masked.

    q: [B, Hq, Sq, D] (Sq small); k, v: [B, Hkv, S, D] (int8 with
    ``k_scale``/``v_scale`` [B, Hkv] for the quantized cache).
    ``causal=True`` places query i at position kv_seq_len-Sq+i with
    in-chunk causality — the bandwidth-shaped kernel for the speculative
    verify step and small chunked-prefill tails.

    ``k_new``/``v_new`` [B, Hkv, 1, D] (or [B, Hkv, D]): the deferred-
    append decode path — ``kv_seq_len`` then counts only the rows already
    in the cache, and the fresh token folds into the online softmax
    in-VMEM (requires sq == 1; pass the rows in the cache's storage dtype
    — quantized when the cache is int8). The cache write itself then
    happens off the attention critical path (back-to-back slab rewrites
    at step end).

    ``q_packed=(q_arr, hq)``: q already in the kernel's packed layout
    [B, Hkv*rows_pad, Dp] (ops.rope_prep emits it) — skips the per-call
    pad+reshape; pass ``q=None``. ``out_layout="flat"`` returns
    [B, Hq*Dv] directly (the wo-projection input layout; sq == 1 only).
    """
    if q_packed is not None:
        assert q is None
        q_arr, hq = q_packed
        b = q_arr.shape[0]
        sq = 1
        _, hkv, sk, dv = v.shape
        d = k.shape[-1]
        dp = _ceil_mult(d, _LANES)
        assert q_arr.shape[2] == dp, (q_arr.shape, dp)
    else:
        b, hq, sq, d = q.shape
        _, hkv, sk, dv = v.shape
        dp = _ceil_mult(d, _LANES)
    assert hq % hkv == 0
    group = hq // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    if out_dtype is None:
        qd = (q if q_packed is None else q_packed[0]).dtype
        out_dtype = qd if jnp.issubdtype(qd, jnp.floating) else jnp.bfloat16
    has_kv_scale = k_scale is not None
    if has_kv_scale:
        assert v_scale is not None and k_scale.shape == (b, hkv)
    has_new = k_new is not None
    if has_new:
        assert v_new is not None and sq == 1 and not causal
        if k_new.ndim == 4:
            k_new = k_new.reshape(b, hkv, d)
            v_new = v_new.reshape(b, hkv, dv)
        assert k_new.shape == (b, hkv, d) and v_new.shape[:2] == (b, hkv)
        assert kv_seq_len is not None, "deferred append needs old-row counts"
    assert out_layout in ("bhsd", "flat")
    flat_out = out_layout == "flat"
    if flat_out:
        assert sq == 1, "flat output layout is per-token decode only"

    bk = min(_ceil_mult(sk, 128), max(128, _ceil_mult(min(block_k, sk), 128)))
    dvp = _ceil_mult(dv, _LANES)
    rows = group * sq
    rows_pad = _ceil_mult(rows, 8)
    if q_packed is not None:
        assert q_arr.shape == (b, hkv * rows_pad, dp), (
            q_arr.shape, (b, hkv * rows_pad, dp)
        )
        q_p = q_arr
    else:
        q_r = q.reshape(b, hkv, rows, d)
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, rows_pad - rows), (0, dp - d)))
        q_p = q_r.reshape(b, hkv * rows_pad, dp)
    k_p = pad_to(k, (None, None, bk, dp))
    v_p = pad_to(v, (None, None, bk, dvp))
    n_steps = k_p.shape[2] // bk

    if kv_seq_len is None:
        lens = jnp.full((1, b), sk, jnp.int32)
    else:
        lens = jnp.asarray(kv_seq_len, jnp.int32).reshape(1, b)
    # table slot unused on the dense path; a [B, 1] zero placeholder keeps
    # the kernel signature shared with the paged variant
    table = jnp.zeros((b, 1), jnp.int32)

    from composable_kernel_tpu import indexing

    def q_index(batch, kk, *_):
        return (batch, 0, 0)

    def kv_index(batch, kk, table_s, lens_s):
        return (batch, 0, indexing.clamped_block(kk, lens_s[0, batch], bk), 0)

    if fused_heads is None:
        fused_heads = _fused_heads_default(hkv)
    if kv_subs is None:
        # 2 sub-operands per K and per V = 4 concurrent DMA streams: the
        # v5e DMA engine needs several in-flight streams for peak rate
        # (scripts/probe_kv_dma.py: 438 GB/s at 1 stream, 624 at 4), and
        # the parity-parked clamp (indexing.clamped_parity_block) reads
        # dead tails at bs granularity instead of bk.
        kv_subs = 2 if fused_heads else 1
    kv_subs = max(1, min(kv_subs, bk // 128))
    if not fused_heads:
        kv_subs = 1
    while bk % kv_subs:
        kv_subs -= 1
    bs = bk // kv_subs

    def kv_sub_index(t, ksubs=kv_subs, bs_=None):
        def f(batch, kk, table_s, lens_s):
            return (
                batch,
                0,
                indexing.clamped_parity_block(
                    kk, t, lens_s[0, batch], bs, ksubs
                ),
                0,
            )
        return f

    in_specs = [
        pl.BlockSpec((1, hkv * rows_pad, dp), q_index, memory_space=pltpu.VMEM),
    ]
    for t in range(kv_subs):
        in_specs.append(pl.BlockSpec((1, hkv, bs, dp), kv_sub_index(t),
                                     memory_space=pltpu.VMEM))
    for t in range(kv_subs):
        in_specs.append(pl.BlockSpec((1, hkv, bs, dvp), kv_sub_index(t),
                                     memory_space=pltpu.VMEM))
    inputs = [q_p] + [k_p] * kv_subs + [v_p] * kv_subs
    if has_kv_scale:
        # [B, 1, Hkv] with a (1, 1, Hkv) block: trailing dims equal the
        # array dims, satisfying Mosaic's block rule (a (1, Hkv) block over
        # [B, Hkv] does not when B > 1)
        sc_spec = pl.BlockSpec(
            (1, 1, hkv), lambda batch, kk, *_: (batch, 0, 0),
            memory_space=pltpu.SMEM,
        )
        in_specs += [sc_spec, sc_spec]
        inputs += [
            jnp.asarray(k_scale, jnp.float32).reshape(-1, 1, hkv),
            jnp.asarray(v_scale, jnp.float32).reshape(-1, 1, hkv),
        ]
    if has_new:
        # [B, Hkv, D] 3-D layout: trailing block dims equal the array dims
        # (Mosaic's rule), so no row padding and no per-call jnp.pad
        in_specs += [
            pl.BlockSpec((1, hkv, dp), lambda batch, kk, *_: (batch, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hkv, dvp), lambda batch, kk, *_: (batch, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        kn3 = k_new.reshape(b, hkv, d)
        vn3 = v_new.reshape(b, hkv, dv)
        if dp != d:
            kn3 = jnp.pad(kn3, ((0, 0), (0, 0), (0, dp - d)))
        if dvp != dv:
            vn3 = jnp.pad(vn3, ((0, 0), (0, 0), (0, dvp - dv)))
        inputs += [kn3, vn3]

    if window is not None and not causal:
        assert sq == 1, (
            "sliding-window decode is per-token (sq == 1) unless causal "
            "(per-query windows)"
        )
    kernel = functools.partial(
        _paged_kernel,
        scale=scale,
        page=bk,
        n_steps=n_steps,
        n_kv_heads=hkv,
        rows_per_kv=rows_pad,
        has_kv_scale=has_kv_scale,
        window=window,
        causal_sq=sq if causal else 1,
        has_new=has_new,
        rows_live=rows if flat_out else None,
        fused_heads=fused_heads,
        kv_subs=kv_subs,
    )

    out_rows = hkv * rows if flat_out else hkv * rows_pad
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_rows, dvp), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_steps),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, out_rows, dvp), q_index,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((hkv * rows_pad, _LANES), jnp.float32),
                pltpu.VMEM((hkv * rows_pad, _LANES), jnp.float32),
                pltpu.VMEM((hkv * rows_pad, dvp), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(table, lens, *inputs)

    if flat_out:
        if dvp != dv:
            out = out[:, :, :dv]
        return out.reshape(b, hq * dv)
    out = out.reshape(b, hkv, rows_pad, dvp)[:, :, :rows, :dv]
    return out.reshape(b, hq, sq, dv)


class PagedKVCache:
    """Host-side page allocator + device pools for paged decode.

    Pages are allocated from a free list as sequences grow and returned on
    free(). Token appends are functional jnp scatter updates (donate the
    pools under jit for in-place HBM writes). The reference has no serving
    runtime at all; this mirrors what its later paged-fmha trait assumes
    the runtime provides.
    """

    def __init__(self, n_pages: int, page: int, n_kv_heads: int, head_dim: int,
                 dtype=jnp.bfloat16):
        self.page = page
        self.k_pool = jnp.zeros((n_pages, n_kv_heads, page, head_dim), dtype)
        self.v_pool = jnp.zeros((n_pages, n_kv_heads, page, head_dim), dtype)
        self._free = list(range(n_pages - 1, 0, -1))  # page 0 = null target
        self.tables: dict[int, list[int]] = {}
        self.lens: dict[int, int] = {}

    def alloc(self, seq_id: int) -> None:
        assert seq_id not in self.tables
        self.tables[seq_id] = []
        self.lens[seq_id] = 0

    def free(self, seq_id: int) -> None:
        self._free.extend(reversed(self.tables.pop(seq_id)))
        del self.lens[seq_id]

    def _ensure_capacity(self, seq_id: int, new_len: int) -> None:
        t = self.tables[seq_id]
        while len(t) * self.page < new_len:
            assert self._free, "KV pool exhausted"
            t.append(self._free.pop())

    def append(self, seq_id: int, k_new, v_new) -> None:
        """Append [T, Hkv, D] keys/values for one sequence."""
        t_new = k_new.shape[0]
        start = self.lens[seq_id]
        self._ensure_capacity(seq_id, start + t_new)
        tab = self.tables[seq_id]
        for i in range(t_new):  # decode appends are T=1; prefill chunks small
            pos = start + i
            pg, off = tab[pos // self.page], pos % self.page
            self.k_pool = self.k_pool.at[pg, :, off].set(
                k_new[i].astype(self.k_pool.dtype)
            )
            self.v_pool = self.v_pool.at[pg, :, off].set(
                v_new[i].astype(self.v_pool.dtype)
            )
        self.lens[seq_id] = start + t_new

    def batch_views(self, seq_ids):
        """(block_table [B, max_pages], seq_lens [B]) for the given batch."""
        import numpy as np

        max_pages = max(1, max(len(self.tables[s]) for s in seq_ids))
        table = np.zeros((len(seq_ids), max_pages), np.int32)
        lens = np.zeros((len(seq_ids),), np.int32)
        for i, s in enumerate(seq_ids):
            t = self.tables[s]
            table[i, : len(t)] = t
            lens[i] = self.lens[s]
        return jnp.asarray(table), jnp.asarray(lens)
