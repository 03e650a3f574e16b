"""In-place decode KV-cache row update.

The decode step appends one token's K/V per slot at a per-slot position.
The jnp formulation (``vmap(dynamic_update_slice)`` with traced per-slot
offsets) lowers to a scatter — measured ~52 us per cache per layer at
B=8 on v5e (16.8 MB cache), i.e. ~3.3 ms of a Llama-8B decode step, by
far the largest non-GEMM cost. This kernel aliases the cache buffer
(``input_output_aliases``) and rewrites only the 32-row slab containing
the target row per slot: grid (B,), one slab DMA in, one out.

The slab (not single-row) granularity satisfies Mosaic's tiling rule
(second-minor block dim must be a sublane multiple: 32 for int8, which
also covers bf16's 16); the row is merged with a vector select, no
dynamic sublane stores.

CK analog: none — the reference has no serving runtime; this is the page
-row append its later splitkv-paged trait assumes the runtime provides.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.gemm.kernel import _interpret_default

__all__ = [
    "kv_cache_append_chunk",
    "kv_cache_update",
    "kv_cache_update_paged",
    "kv_cache_update_paged_chunk",
]

# Measured negative (round 4, scripts/probe_kv_update_all.py): batching all
# layers' cache updates into ONE launch with 2L aliased in/out refs — the
# per-grid-step block DMAs serialize across refs (no cross-ref pipelining),
# so a 64-cache launch costs 3.4 ms where 32 consecutive 2-cache launches
# pipeline at ~2 us each (61.9 us total). The decode steps therefore defer
# the writes (attention folds the fresh token in-VMEM, paged.py has_new)
# and replay the per-layer kernels back-to-back at step end.

_SLAB = 32  # int8 sublane tile; covers bf16 (16) and f32 (8) too


def _kernel(pos_ref, kc_ref, vc_ref, kn_ref, vn_ref, ko_ref, vo_ref):
    b = pl.program_id(0)
    row = pos_ref[b] % _SLAB
    ridx = jax.lax.broadcasted_iota(jnp.int32, (1, _SLAB, 1), 1)
    keep = ridx != row
    ko_ref[0] = jnp.where(keep, kc_ref[0], kn_ref[0])
    vo_ref[0] = jnp.where(keep, vc_ref[0], vn_ref[0])


def kv_cache_update(k_cache, v_cache, k_new, v_new, positions, *,
                    interpret: bool | None = None):
    """Write ``k_new/v_new [B, H, 1, D]`` at ``positions [B]`` into the
    caches ``[B, H, S, D]`` in place (buffers are donated via aliasing).

    Returns the updated (k_cache, v_cache). S must be a multiple of 32.
    """
    b, h, s, d = k_cache.shape
    assert k_new.shape == (b, h, 1, d) and v_new.shape == (b, h, 1, d)
    assert v_cache.shape == (b, h, s, d)
    assert s % _SLAB == 0, f"cache length {s} must be a multiple of {_SLAB}"
    if interpret is None:
        interpret = _interpret_default()
    positions = jnp.asarray(positions, jnp.int32)

    def slab_idx(bb, pos_ref):
        return (bb, 0, pos_ref[bb] // _SLAB, 0)

    def new_idx(bb, pos_ref):
        return (bb, 0, 0, 0)

    cache_spec = pl.BlockSpec((1, h, _SLAB, d), slab_idx,
                              memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, h, 1, d), new_idx, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[cache_spec, cache_spec, new_spec, new_spec],
            out_specs=(cache_spec, cache_spec),
        ),
        # operand indices include the scalar-prefetch arg: positions=0,
        # k_cache=1, v_cache=2 alias outputs 0/1
        input_output_aliases={1: 0, 2: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(positions, k_cache, v_cache, k_new, v_new)


def _paged_kernel(pg_ref, off_ref, kc_ref, vc_ref, kn_ref, vn_ref,
                  ko_ref, vo_ref):
    b = pl.program_id(0)
    row = off_ref[b] % _SLAB
    ridx = jax.lax.broadcasted_iota(jnp.int32, (1, _SLAB, 1), 1)
    keep = ridx != row
    ko_ref[0] = jnp.where(keep, kc_ref[0], kn_ref[0])
    vo_ref[0] = jnp.where(keep, vc_ref[0], vn_ref[0])


def kv_cache_update_paged(k_pool, v_pool, k_new, v_new, pages, offsets, *,
                          interpret: bool | None = None):
    """Paged-pool variant: write ``k_new/v_new [B, H, 1, D]`` into page
    pools ``[P, H, page, D]`` at row ``offsets[b]`` of page ``pages[b]``.

    The paged analog of :func:`kv_cache_update` — ``paged_decode_step``'s
    jnp page scatter lowers to the same full-pool scatter the contiguous
    path paid. Pool buffers are donated via aliasing; live pages are
    disjoint across slots (the engine's page-pool invariant), so the
    per-slot slab rewrites never collide (inactive slots all target the
    never-read null page 0 — last write wins there, harmlessly).
    Returns the updated (k_pool, v_pool). page size must be a multiple
    of 32.
    """
    p, h, page, d = k_pool.shape
    b = k_new.shape[0]
    assert k_new.shape == (b, h, 1, d) and v_new.shape == (b, h, 1, d)
    assert v_pool.shape == (p, h, page, d)
    assert page % _SLAB == 0, f"page size {page} must be a multiple of {_SLAB}"
    if interpret is None:
        interpret = _interpret_default()
    pages = jnp.asarray(pages, jnp.int32)
    offsets = jnp.asarray(offsets, jnp.int32)

    def slab_idx(bb, pg_ref, off_ref):
        return (pg_ref[bb], 0, off_ref[bb] // _SLAB, 0)

    def new_idx(bb, pg_ref, off_ref):
        return (bb, 0, 0, 0)

    pool_spec = pl.BlockSpec((1, h, _SLAB, d), slab_idx,
                             memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, h, 1, d), new_idx, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _paged_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b,),
            in_specs=[pool_spec, pool_spec, new_spec, new_spec],
            out_specs=(pool_spec, pool_spec),
        ),
        # operand indices include the two scalar-prefetch args: pages=0,
        # offsets=1, k_pool=2, v_pool=3 alias outputs 0/1
        input_output_aliases={2: 0, 3: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(pages, offsets, k_pool, v_pool, k_new, v_new)


def _paged_chunk_kernel(offmod_ref, pg_ref, sl_ref, kc_ref, vc_ref,
                        kn_ref, vn_ref, ko_ref, vo_ref, *, c: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    off0 = offmod_ref[b]
    j = t * _SLAB + jax.lax.broadcasted_iota(jnp.int32, (1, _SLAB, 1), 1)
    use_new = (j >= off0) & (j < off0 + c)
    ko_ref[0] = jnp.where(use_new, kn_ref[0], kc_ref[0])
    vo_ref[0] = jnp.where(use_new, vn_ref[0], vc_ref[0])


def kv_cache_update_paged_chunk(k_pool, v_pool, k_new, v_new, table, pos, *,
                                page: int, interpret: bool | None = None):
    """Append a C-row chunk per slot into the page pools in place.

    k_new/v_new: [B, H, C, D] rows for positions ``pos[b] .. pos[b]+C-1``
    (the paged chunked-prefill / speculative-verify append —
    ``paged_prefill_chunk_step``'s jnp version is one full-pool scatter
    PER CHUNK OFFSET). table: [B, max_pages] page ids; pages covering the
    span must be allocated (inactive slots point at null page 0).

    Grid is (B, slabs-touched): each step rewrites one 32-row slab. The
    chunk rows are pre-shifted host-side into slab-aligned buffers
    ([B, H, T*32, D], chunk at offset pos%32) so a slab never needs rows
    from a neighbour's buffer — and, critically, no two grid steps touch
    the same live slab: Pallas double-buffers aliased inputs, so a
    consecutive-step read of a just-written slab would see stale data
    (the hazard that rules out a naive per-row grid).

    Returns the updated (k_pool, v_pool). page must be a multiple of 32.
    """
    p, h, page_rows, d = k_pool.shape
    assert page_rows == page and page % _SLAB == 0
    b, _, c, _ = k_new.shape
    assert k_new.shape == (b, h, c, d) and v_new.shape == (b, h, c, d)
    if interpret is None:
        interpret = _interpret_default()
    pos = jnp.asarray(pos, jnp.int32)
    n_slabs = (c + _SLAB - 1) // _SLAB + 1  # worst-case straddle

    off_mod = pos % _SLAB  # [B] chunk offset inside its first slab
    # slab-aligned pre-shift: rows [off_mod, off_mod + C) of a T*32 buffer
    buf_shape = (h, n_slabs * _SLAB, d)

    def shift(new, o):
        return jax.lax.dynamic_update_slice(
            jnp.zeros(buf_shape, new.dtype), new, (0, o, 0)
        )

    k_shift = jax.vmap(shift)(k_new.astype(k_pool.dtype), off_mod)
    v_shift = jax.vmap(shift)(v_new.astype(v_pool.dtype), off_mod)

    # per-(slot, slab) geometry: global row g0 -> (page id, slab-in-page)
    g0 = (pos - off_mod)[:, None] + jnp.arange(n_slabs, dtype=jnp.int32)[None] * _SLAB
    p_idx = jnp.clip(g0 // page, 0, table.shape[1] - 1)
    pg = jnp.take_along_axis(jnp.asarray(table, jnp.int32), p_idx, axis=1)
    sl = (g0 % page) // _SLAB
    # untouched trailing slabs (g0 >= pos + C) write keep-all into their
    # mapped slab; redirect them at the never-read null page 0
    dead = g0 >= pos[:, None] + c
    pg = jnp.where(dead, 0, pg)
    sl = jnp.where(dead, 0, sl)

    def slab_idx(bb, tt, offmod_ref, pg_ref, sl_ref):
        return (pg_ref[bb, tt], 0, sl_ref[bb, tt], 0)

    def new_idx(bb, tt, *_):
        return (bb, 0, tt, 0)

    pool_spec = pl.BlockSpec((1, h, _SLAB, d), slab_idx,
                             memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, h, _SLAB, d), new_idx,
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_paged_chunk_kernel, c=c),
        out_shape=(
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, n_slabs),
            in_specs=[pool_spec, pool_spec, new_spec, new_spec],
            out_specs=(pool_spec, pool_spec),
        ),
        # operands incl. scalar-prefetch: off_mod=0, pg=1, sl=2, k_pool=3,
        # v_pool=4 alias outputs 0/1
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(off_mod, pg, sl, k_pool, v_pool, k_shift, v_shift)


def _chunk_kernel(sl_ref, pos_ref, len_ref, kc_ref, vc_ref, kn_ref, vn_ref,
                  ko_ref, vo_ref, *, c: int):
    e = pl.program_id(0)
    live = len_ref[e]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (1, c, 1), 1)
    take = ridx < live  # rows past the entry's live length keep the cache
    ko_ref[0] = jnp.where(take, kn_ref[0], kc_ref[0])
    vo_ref[0] = jnp.where(take, vn_ref[0], vc_ref[0])


def kv_cache_append_chunk(k_cache, v_cache, k_new, v_new, slots, pos, lens, *,
                          interpret: bool | None = None):
    """Write packed prefill chunks into contiguous caches in place.

    k_new/v_new: [E, H, c, D] — entry e's chunk rows (c fixed span).
    slots[e]:    cache slot the entry writes. LIVE entries must name
                 distinct slots, and dead (lens==0) pad entries must NOT
                 alias a slot that any live entry writes this call: two
                 grid steps read-modify-writing the same aliased slab can
                 re-fetch the stale double-buffered input buffer on real
                 TPU and revert the live write (see the module-level
                 aliasing note / CLAUDE.md). Point pads at a slot with no
                 live writer — several pads sharing one dead slot is fine
                 (identity rewrites are idempotent).
    pos[e]:      row offset (a multiple of c: chunk rounds advance by c;
                 checked host-side when pos is concrete — a misaligned
                 offset would silently floor to the wrong slab).
    lens[e]:     live rows; rows >= lens[e] keep the existing cache
                 content, lens[e] == 0 is a full no-op rewrite (bucket
                 padding entries never corrupt finished slots).

    The chunked-prefill analog of :func:`kv_cache_update`: one aliased
    c-row slab rewrite per entry instead of a traced-offset scatter over
    the [B, H, S, D] cache. Returns (k_cache, v_cache).
    """
    b, h, s, d = k_cache.shape
    e, h2, c, d2 = k_new.shape
    assert (h2, d2) == (h, d) and v_new.shape == k_new.shape
    assert v_cache.shape == k_cache.shape
    assert c % _SLAB == 0, f"chunk span {c} must be a multiple of {_SLAB}"
    assert s % c == 0, (s, c)
    if interpret is None:
        interpret = _interpret_default()
    if not isinstance(pos, jax.core.Tracer):
        pos_np = np.asarray(pos)
        if (pos_np % c).any():
            raise ValueError(
                f"kv_cache_append_chunk: pos must be multiples of the chunk "
                f"span c={c}, got {pos_np.tolist()} (misaligned offsets "
                f"would silently floor to the wrong cache slab)"
            )
    slots = jnp.asarray(slots, jnp.int32)
    pos = jnp.asarray(pos, jnp.int32)
    lens = jnp.asarray(lens, jnp.int32)

    def slab_idx(ee, sl_ref, pos_ref, len_ref):
        return (sl_ref[ee], 0, pos_ref[ee] // c, 0)

    def new_idx(ee, *_):
        return (ee, 0, 0, 0)

    cache_spec = pl.BlockSpec((1, h, c, d), slab_idx, memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, h, c, d), new_idx, memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_chunk_kernel, c=c),
        out_shape=(
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(e,),
            in_specs=[cache_spec, cache_spec, new_spec, new_spec],
            out_specs=(cache_spec, cache_spec),
        ),
        # operands incl. the three scalar-prefetch args: slots=0, pos=1,
        # lens=2, k_cache=3, v_cache=4 alias outputs 0/1
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(slots, pos, lens, k_cache, v_cache, k_new, v_new)
