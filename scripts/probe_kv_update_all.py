"""Measured-negative record: many-ref batched KV updates vs per-layer.

Round-4 finding (kept reproducible here; the batched primitive was NOT
shipped): putting all layers' cache updates into ONE pallas launch with
2L aliased in/out refs serializes the per-grid-step block DMAs across
refs — no cross-ref pipelining — so a 64-cache launch costs ~3.4 ms
where 32 consecutive 2-cache launches pipeline at ~2 us each (~62 us
total) at the Llama-8B decode shape. Consequently the decode steps defer
the appends (attention folds the fresh token in-VMEM) and replay the
per-layer kv_cache_update kernels back-to-back at step end.

Usage: python scripts/probe_kv_update_all.py
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.kv_update import _SLAB, kv_cache_update
from composable_kernel_tpu.utils.timing import benchmark_chained


def _kernel_all(pos_ref, *refs, n_caches):
    b = pl.program_id(0)
    row = pos_ref[b] % _SLAB
    ridx = jax.lax.broadcasted_iota(jnp.int32, (1, _SLAB, 1), 1)
    keep = ridx != row
    caches = refs[:n_caches]
    news = refs[n_caches : 2 * n_caches]
    outs = refs[2 * n_caches :]
    for c_ref, n_ref, o_ref in zip(caches, news, outs):
        o_ref[0] = jnp.where(keep, c_ref[0], n_ref[0])


def kv_cache_update_many(caches, news, positions):
    """The removed many-ref variant, inlined for the record."""
    n = len(caches)
    b, h, s, d = caches[0].shape

    def slab_idx(bb, pos_ref):
        return (bb, 0, pos_ref[bb] // _SLAB, 0)

    def new_idx(bb, pos_ref):
        return (bb, 0, 0, 0)

    cache_spec = pl.BlockSpec((1, h, _SLAB, d), slab_idx,
                              memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, h, 1, d), new_idx, memory_space=pltpu.VMEM)
    return list(pl.pallas_call(
        functools.partial(_kernel_all, n_caches=n),
        out_shape=tuple(jax.ShapeDtypeStruct(c.shape, c.dtype) for c in caches),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[cache_spec] * n + [new_spec] * n,
            out_specs=tuple([cache_spec] * n),
        ),
        input_output_aliases={1 + i: i for i in range(n)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(jnp.asarray(positions, jnp.int32), *caches, *news))


def main():
    n_layers, b, h, s, d = 32, 8, 8, 2048, 128
    key = jax.random.PRNGKey(0)
    mk = lambda k, shape: jax.random.randint(k, shape, -100, 100, jnp.int32).astype(jnp.int8)
    ks = jax.random.split(key, 4)
    caches = [mk(ks[i % 4], (b, h, s, d)) for i in range(2 * n_layers)]
    news = [mk(ks[(i + 1) % 4], (b, h, 1, d)) for i in range(2 * n_layers)]
    pos = jnp.asarray([1024 + 7 * i for i in range(b)], jnp.int32)

    slab_bytes = 2 * 2 * n_layers * b * h * 32 * d  # in+out, 2L caches

    def per_layer(p, *arrs):
        cs, ns = arrs[: 2 * n_layers], arrs[2 * n_layers :]
        outs = []
        for i in range(n_layers):
            k_, v_ = kv_cache_update(cs[2 * i], cs[2 * i + 1],
                                     ns[2 * i], ns[2 * i + 1], p)
            outs.append(k_)
        return outs[0]

    r = benchmark_chained(per_layer, pos, *caches, *news, iters_lo=20,
                          iters_hi=80, bytes_accessed=float(slab_bytes))
    print(f"per-layer ({n_layers} launches)   : {r.avg_ms*1e3:7.1f} us "
          f"({r.gbps:.0f} GB/s slab traffic)")

    for g in (4, 32):
        def grouped(p, *arrs):
            cs, ns = arrs[: 2 * n_layers], arrs[2 * n_layers :]
            out0 = None
            for i in range(0, n_layers, g):
                got = kv_cache_update_many(
                    list(cs[2 * i : 2 * (i + g)]),
                    list(ns[2 * i : 2 * (i + g)]), p)
                out0 = out0 if out0 is not None else got[0]
            return out0

        r = benchmark_chained(grouped, pos, *caches, *news, iters_lo=20,
                              iters_hi=80, bytes_accessed=float(slab_bytes))
        print(f"many-ref g={g:2d} ({n_layers//g} launches): "
              f"{r.avg_ms*1e3:7.1f} us ({r.gbps:.0f} GB/s slab traffic)")


if __name__ == "__main__":
    main()
