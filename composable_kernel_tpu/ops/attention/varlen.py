"""Packed-varlen (group-mode) flash attention.

CK's fmha *group mode* packs ragged batches contiguously and walks them
via seqstart pointer arrays (``fmha_fwd_kernel.hpp:231-233,505-555``), so
no query ever pays padded compute. The TPU re-design: sequences pack into
one [T, H, D] buffer with every sequence's start aligned to the Q/KV
block (the packer pads each sequence to the next block boundary — at most
block-1 rows each, vs padding EVERY sequence to the batch max). The grid
runs over packed q blocks; a scalar-prefetch meta table gives each block
its sequence's geometry, and the KV BlockSpec index map walks only that
sequence's KV range (dead steps clamp their DMA and skip compute).

Mixed-length serving prefill is the target regime: a (128..2048)-token
mixed batch pays sum(ceil(len/block)) block rows instead of
B * ceil(max/block). Measured (v5e, GQA 32/8 D=128, lens 128..2048):
1.51x the padded flash path at the default (512, 1024) blocks — the
asymmetry matters: small q blocks bound per-sequence padding, big kv
blocks keep the per-tile MXU/softmax ratio (symmetric 256 blocks lose
the padding win to tile inefficiency, 1.01x).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu import indexing
from composable_kernel_tpu.ops.gemm.kernel import (
    _ceil_mult,
    _interpret_default,
    pad_to,
)

__all__ = [
    "flash_attention_varlen",
    "flash_attention_varlen_cache",
    "pack_varlen",
    "unpack_varlen",
]

_NEG_INF = -1e30
_LANES = 128


def pack_varlen(xs, block: int):
    """Pack per-sequence [L_i, H, D] arrays into one [T, H, D] buffer with
    block-aligned starts. Returns (packed, starts [B], lens [B])."""
    import numpy as np

    starts, lens, parts = [], [], []
    off = 0
    for x in xs:
        li = x.shape[0]
        pad = _ceil_mult(li, block)
        starts.append(off)
        lens.append(li)
        parts.append(jnp.pad(x, ((0, pad - li),) + ((0, 0),) * (x.ndim - 1)))
        off += pad
    return (
        jnp.concatenate(parts, axis=0),
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(lens, jnp.int32),
    )


def unpack_varlen(packed, starts, lens):
    """Inverse of pack_varlen (host-side, static starts/lens)."""
    return [packed[int(s) : int(s) + int(l)] for s, l in zip(starts, lens)]


def _varlen_kernel(
    meta_ref,  # [3, n_q_blocks] int32: q_pos_base, kv_len, kv_blk0
    q_ref,  # [1, bq, D]
    k_ref,  # [1, bk, D]
    v_ref,
    o_ref,
    m_scr,
    l_scr,
    acc_scr,
    *,
    scale: float,
    causal: bool,
    window: int | None,
    n_kv_steps: int,
    bq: int,
    bk: int,
):
    qb = pl.program_id(1)
    kv = pl.program_id(2)
    q_pos0 = meta_ref[0, qb]   # global key-position of this block's row 0
    kv_len = meta_ref[1, qb]

    @pl.when(kv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    live = kv * bk < kv_len
    if causal:
        live &= kv * bk <= q_pos0 + bq - 1
    if window is not None:
        live &= kv * bk + bk - 1 > q_pos0 - window

    # interior tiles (fully inside the live, causal-allowed region) skip
    # the mask build — same specialization as the dense kernel
    interior = (kv + 1) * bk <= kv_len
    if causal:
        interior &= (kv * bk + bk - 1) <= q_pos0
    if window is not None:
        interior &= kv * bk > (q_pos0 + bq - 1) - window

    def _step(masked: bool):
        q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            q_pos = q_pos0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            k_pos = kv * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = k_pos < kv_len
            if causal:
                mask &= k_pos <= q_pos
            if window is not None:
                mask &= k_pos > q_pos - window
            s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[...]
        row_max = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, row_max)
        corr = jnp.exp(m_prev - m_new)
        m_scr[...] = m_new
        p16 = jnp.exp(s - m_new[:, :1]).astype(v.dtype)
        l_scr[...] = l_scr[...] * corr + jnp.sum(
            p16.astype(jnp.float32), axis=-1, keepdims=True
        )
        pv = jax.lax.dot_general(
            p16, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * corr[:, :1] + pv

    @pl.when(live & interior)
    def _plain():
        _step(False)

    @pl.when(live & jnp.logical_not(interior))
    def _masked():
        _step(True)

    @pl.when(kv == n_kv_steps - 1)
    def _finish():
        l = l_scr[...][:, :1]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def flash_attention_varlen(
    q,
    k,
    v,
    q_starts,
    q_lens,
    kv_starts,
    kv_lens,
    *,
    causal: bool = True,
    window: int | None = None,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    out_dtype=None,
    interpret: bool | None = None,
):
    """Group-mode attention over block-aligned packed sequences.

    q:        [Tq, Hq, D] packed queries (``pack_varlen(..., block_q)``)
    k, v:     [Tk, Hkv, D] packed keys/values (``pack_varlen(..., block_k)``)
    q_starts/kv_starts: [B] int32 — each sequence's packed row offset,
              MULTIPLES of block_q / block_k (the packer's contract).
    q_lens/kv_lens:     [B] int32 — true (unpadded) lengths; may be traced.
    causal:   bottom-right aligned per sequence (query i of a sequence
              sits at key position kv_len - q_len + i — the chunked-
              prefill convention; kv_len == q_len gives plain causal).
    Rows in the block padding produce unspecified output (sliced away by
    ``unpack_varlen``). Returns [Tq, Hq, D].
    """
    tq, hq, d = q.shape
    tk, hkv, dv = v.shape
    assert k.shape == (tk, hkv, d)
    assert hq % hkv == 0
    group = hq // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    if out_dtype is None:
        out_dtype = q.dtype

    bq = max(128, _ceil_mult(min(block_q, tq), 8))
    bk = max(128, _ceil_mult(min(block_k, tk), 128))
    assert tq % bq == 0, (tq, bq)
    dp = _ceil_mult(d, _LANES)
    dvp = _ceil_mult(dv, _LANES)

    # [H, T, D] layout: heads parallel-outer, packed rows blocked
    q_p = pad_to(q.transpose(1, 0, 2), (None, None, dp))
    k_p = pad_to(k.transpose(1, 0, 2), (None, bk, dp))
    v_p = pad_to(v.transpose(1, 0, 2), (None, bk, dvp))
    n_q_blocks = tq // bq
    n_kv_steps = k_p.shape[1] // bk

    import numpy as np

    for name, starts, blk in (("q_starts", q_starts, bq),
                              ("kv_starts", kv_starts, bk)):
        if not isinstance(starts, jax.core.Tracer):
            sa = np.asarray(starts)
            assert (sa % blk == 0).all(), (
                f"{name} must be multiples of the {blk}-row block "
                f"(pack_varlen with the same block), got {sa}"
            )
    q_starts = jnp.asarray(q_starts, jnp.int32)
    q_lens = jnp.asarray(q_lens, jnp.int32)
    kv_starts = jnp.asarray(kv_starts, jnp.int32)
    kv_lens = jnp.asarray(kv_lens, jnp.int32)

    # per-q-block meta (host/XLA side; tiny): which sequence, then geometry
    blk_row0 = jnp.arange(n_q_blocks, dtype=jnp.int32) * bq
    seq = jnp.searchsorted(q_starts, blk_row0, side="right") - 1
    q_off = blk_row0 - q_starts[seq]                  # offset inside the seq
    kv_len = kv_lens[seq]
    # bottom-right alignment: row r of this block sits at key position
    # kv_len - q_len + q_off + r
    q_pos0 = kv_len - q_lens[seq] + q_off
    kv_blk0 = kv_starts[seq] // bk
    meta = jnp.stack([q_pos0, kv_len, kv_blk0]).astype(jnp.int32)

    def q_index(h, qb, kv, *_):
        return (h, qb, 0)

    def kv_index(h, qb, kv, meta_s):
        # walk only this sequence's KV range; dead steps re-read the first
        # block (clamped DMA, compute skipped in-kernel)
        return (
            h // group,
            meta_s[2, qb] + indexing.clamped_block(kv, meta_s[1, qb], bk),
            0,
        )

    grid = (hq, n_q_blocks, n_kv_steps)
    kernel = functools.partial(
        _varlen_kernel,
        scale=scale, causal=causal, window=window,
        n_kv_steps=n_kv_steps, bq=bq, bk=bk,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hq, tq, dvp), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, dp), q_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, dp), kv_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, dvp), kv_index, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, dvp), q_index,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((bq, _LANES), jnp.float32),
                pltpu.VMEM((bq, _LANES), jnp.float32),
                pltpu.VMEM((bq, dvp), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, q_p, k_p, v_p)

    return out[:, :, :dv].transpose(1, 0, 2)


def _varlen_cache_kernel(
    meta_ref,  # [3, n_q_blocks] int32: q_pos_base, kv_len, seq
    q_ref,  # [1, bq, D]
    k_ref,  # [1, 1, bk, D]  (cache block of this q-block's slot)
    v_ref,  # [1, 1, bk, Dv]
    *rest,  # [k_scale_ref, v_scale_ref] when has_kv_scale, then o_ref + scratch
    scale: float,
    window: int | None,
    n_kv_steps: int,
    bq: int,
    bk: int,
    has_kv_scale: bool,
):
    if has_kv_scale:
        k_scale_ref, v_scale_ref, o_ref, m_scr, l_scr, acc_scr = rest
    else:
        o_ref, m_scr, l_scr, acc_scr = rest
    qb = pl.program_id(1)
    kv = pl.program_id(2)
    q_pos0 = meta_ref[0, qb]  # global key-position of this block's row 0
    kv_len = meta_ref[1, qb]

    @pl.when(kv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    live = kv * bk < kv_len
    live &= kv * bk <= q_pos0 + bq - 1  # causal (always on: chunked prefill)
    if window is not None:
        live &= kv * bk + bk - 1 > q_pos0 - window

    interior = (kv + 1) * bk <= kv_len
    interior &= (kv * bk + bk - 1) <= q_pos0
    if window is not None:
        interior &= kv * bk > (q_pos0 + bq - 1) - window

    def _step(masked: bool):
        # int8 cache: fold the per-(slot, head) k scale into the q
        # pre-scale and defer the v scale to the finish — the dense
        # kernel's single-convert placement (ops/attention/kernel.py)
        s_mul = scale * k_scale_ref[0, 0, 0] if has_kv_scale else scale
        q = (q_ref[0].astype(jnp.float32) * s_mul).astype(q_ref.dtype)
        k = k_ref[0, 0].astype(q_ref.dtype)
        v = v_ref[0, 0].astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if masked:
            q_pos = q_pos0 + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            k_pos = kv * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            mask = (k_pos < kv_len) & (k_pos <= q_pos)
            if window is not None:
                mask &= k_pos > q_pos - window
            s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[...]
        row_max = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, row_max)
        corr = jnp.exp(m_prev - m_new)
        m_scr[...] = m_new
        p16 = jnp.exp(s - m_new[:, :1]).astype(v.dtype)
        l_scr[...] = l_scr[...] * corr + jnp.sum(
            p16.astype(jnp.float32), axis=-1, keepdims=True
        )
        pv = jax.lax.dot_general(
            p16, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc_scr[...] = acc_scr[...] * corr[:, :1] + pv

    @pl.when(live & interior)
    def _plain():
        _step(False)

    @pl.when(live & jnp.logical_not(interior))
    def _masked():
        _step(True)

    @pl.when(kv == n_kv_steps - 1)
    def _finish():
        l = l_scr[...][:, :1]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o = acc_scr[...] / l_safe
        if has_kv_scale:
            o = o * v_scale_ref[0, 0, 0]
        o_ref[0] = o.astype(o_ref.dtype)


def flash_attention_varlen_cache(
    q,
    cache_k,
    cache_v,
    q_starts,
    q_lens,
    kv_lens,
    *,
    slot_ids=None,
    k_scale=None,
    v_scale=None,
    window: int | None = None,
    scale: float | None = None,
    block_q: int = 256,
    block_k: int = 1024,
    out_dtype=None,
    interpret: bool | None = None,
):
    """Packed chunk queries against per-slot KV caches (chunked prefill
    group mode — the composition of CK's fmha group mode
    (``fmha_fwd_kernel.hpp:505-555``) with a mid-prefill KV cache, which
    the reference cannot express: its group mode has no cache and its
    batch mode no packing).

    q:        [Tq, Hq, D] packed chunk queries — sequence w's rows start
              at ``q_starts[w]`` (a multiple of ``block_q``) and run for
              ``q_lens[w]`` live rows (``pack_varlen`` layout). Sequence w
              reads cache slot w.
    cache_k/cache_v: [B, Hkv, S, D] caches (bf16/f32, or int8 with
              ``k_scale``/``v_scale`` [B, Hkv] f32 per-head scales). The
              chunk's own K/V rows must already be written.
    kv_lens:  live cache rows per sequence INCLUDING the chunk (int32,
              one entry per packed sequence).
    slot_ids: optional int32 map from packed sequence w to its cache slot
              (default: sequence w reads cache slot w). Lets a serving
              wave pack only its live entries while finished slots keep
              their caches untouched.
    Causality is bottom-right per sequence: chunk row i of slot w sits at
    key position ``kv_lens[w] - q_lens[w] + i`` (the chunked-prefill
    convention shared with ``prefill_chunk_step``'s causal_offset).
    Zero-length sequences are allowed (finished wave slots): they own no
    q rows and cost nothing. Rows in the block padding (past a sequence's
    ``q_lens``) produce unspecified output — consumers must slice live
    rows via ``unpack_varlen``/the packing geometry, never read pad rows.
    Returns [Tq, Hq, Dv].
    """
    tq, hq, d = q.shape
    b, hkv, s_max, dk = cache_k.shape
    dv = cache_v.shape[-1]
    assert dk == d and cache_v.shape[:3] == (b, hkv, s_max)
    assert hq % hkv == 0
    group = hq // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    if out_dtype is None:
        out_dtype = q.dtype
    has_kv_scale = k_scale is not None
    if has_kv_scale:
        assert v_scale is not None and k_scale.shape == (b, hkv)

    bq = max(128, _ceil_mult(min(block_q, tq), 8))
    bk = max(128, _ceil_mult(min(block_k, s_max), 128))
    assert tq % bq == 0, (tq, bq)
    assert s_max % bk == 0, (s_max, bk)
    dp = _ceil_mult(d, _LANES)
    dvp = _ceil_mult(dv, _LANES)

    q_p = pad_to(q.transpose(1, 0, 2), (None, None, dp))
    k_p = pad_to(cache_k, (None, None, None, dp))
    v_p = pad_to(cache_v, (None, None, None, dvp))
    n_q_blocks = tq // bq
    n_kv_steps = s_max // bk

    import numpy as np

    if not isinstance(q_starts, jax.core.Tracer):
        sa = np.asarray(q_starts)
        assert (sa % bq == 0).all(), (
            f"q_starts must be multiples of the {bq}-row q block "
            f"(pack_varlen with the same block), got {sa}"
        )
    q_starts = jnp.asarray(q_starts, jnp.int32)
    q_lens = jnp.asarray(q_lens, jnp.int32)
    kv_lens = jnp.asarray(kv_lens, jnp.int32)
    if slot_ids is None:
        slot_ids = jnp.arange(q_starts.shape[0], dtype=jnp.int32)
    slot_ids = jnp.asarray(slot_ids, jnp.int32)

    blk_row0 = jnp.arange(n_q_blocks, dtype=jnp.int32) * bq
    seq = jnp.searchsorted(q_starts, blk_row0, side="right") - 1
    q_off = blk_row0 - q_starts[seq]
    kv_len = kv_lens[seq]
    q_pos0 = kv_len - q_lens[seq] + q_off
    meta = jnp.stack([q_pos0, kv_len, slot_ids[seq]]).astype(jnp.int32)

    def q_index(h, qb, kv, *_):
        return (h, qb, 0)

    def kv_index(h, qb, kv, meta_s):
        # this q block's slot, its kv-head group, clamped cache block
        return (
            meta_s[2, qb],
            h // group,
            indexing.clamped_block(kv, meta_s[1, qb], bk),
            0,
        )

    in_specs = [
        pl.BlockSpec((1, bq, dp), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dp), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bk, dvp), kv_index, memory_space=pltpu.VMEM),
    ]
    inputs = [q_p, k_p, v_p]
    if has_kv_scale:
        ks = jnp.asarray(k_scale, jnp.float32).reshape(b * hkv, 1, 1)
        vs = jnp.asarray(v_scale, jnp.float32).reshape(b * hkv, 1, 1)
        sc_spec = pl.BlockSpec(
            (1, 1, 1),
            lambda h, qb, kv, meta_s: (meta_s[2, qb] * hkv + h // group, 0, 0),
            memory_space=pltpu.SMEM,
        )
        in_specs += [sc_spec, sc_spec]
        inputs += [ks, vs]

    grid = (hq, n_q_blocks, n_kv_steps)
    kernel = functools.partial(
        _varlen_cache_kernel,
        scale=scale, window=window,
        n_kv_steps=n_kv_steps, bq=bq, bk=bk, has_kv_scale=has_kv_scale,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((hq, tq, dvp), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, bq, dvp), q_index,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((bq, _LANES), jnp.float32),
                pltpu.VMEM((bq, _LANES), jnp.float32),
                pltpu.VMEM((bq, dvp), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, *inputs)

    return out[:, :, :dv].transpose(1, 0, 2)
