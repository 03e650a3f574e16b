"""Ragged / grouped GEMM kernel (MoE + continuous-batching building block).

TPU re-design of CK's grouped GEMM with device-side arguments:
``device_grouped_gemm_fixed_nk.hpp`` (SetDeviceKernelArgs:56-57 — per-group
sizes live in a device buffer) and the persistent-kernel
``device_grouped_gemm_tile_loop.hpp:26-95`` (grid is a flat tile loop; each
tile reads its group's args on device, so the host never sees group sizes).

Here the same idea maps to Pallas scalar prefetch: ``group_sizes`` is turned
into a per-m-tile group-id table on device; BlockSpec index maps read it to
select which expert's B matrix streams into VMEM for each tile. The grid is
static (sum_M tiles); group boundaries are dynamic.

Layout contract (fixed-NK, like CK's fixed_nk variant): every group shares
one K and N; each group's rows start at an offset that is a multiple of
``block_m`` (callers pad each group's token block — the MoE dispatch and
continuous-batching schedulers in runtime/ arrange this). Padding rows
produce garbage output rows that callers drop.
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


def _ragged_kernel(gid_ref, a_ref, b_ref, out_ref, acc_ref, *, n_k_steps, c_op):
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        a_ref[...], b_ref[0], preferred_element_type=acc_ref.dtype
    )

    @pl.when(k_idx == n_k_steps - 1)
    def _finish():
        acc = acc_ref[...]
        if c_op is not None:
            acc = c_op(acc)
        out_ref[...] = acc.astype(out_ref.dtype)


def ragged_gemm(
    group_sizes,
    a,
    b,
    *,
    c_op=None,
    out_dtype=None,
    config: GemmConfig | None = None,
    interpret: bool | None = None,
):
    """out[sum_M, N] — each row block of A hits its group's B[g].

    group_sizes: [G] int32, each a multiple of block_m (see module contract);
    sum(group_sizes) may be < a.shape[0] (trailing rows use the last group).
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
    bm = max(m_align, min(cfg.block_m, _ceil_mult(m, m_align)))
    bn = max(128, min(cfg.block_n, _ceil_mult(n, 128)))
    bk = max(128, min(cfg.block_k, _ceil_mult(k, max(sublane_align(b.dtype), 128))))

    a_p = pad_to(a, (bm, bk))
    b_p = pad_to(b, (0, bk, bn))
    mp, kp = a_p.shape
    np_ = b_p.shape[2]
    n_k_steps = kp // bk
    n_m_tiles = mp // bm

    # Per-m-tile group id (device-side "kernel args" table, cf. CK
    # GroupedGemmKernelArgument). tile i -> group of its first row.
    starts = jnp.cumsum(group_sizes) - group_sizes
    tile_rows = jnp.arange(n_m_tiles, dtype=jnp.int32) * bm
    gids = (
        jnp.searchsorted(starts, tile_rows, side="right").astype(jnp.int32) - 1
    ).clip(0, g - 1)

    kernel = functools.partial(_ragged_kernel, n_k_steps=n_k_steps, c_op=c_op)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # gids
            grid=(n_m_tiles, np_ // bn, n_k_steps),
            in_specs=[
                pl.BlockSpec(
                    (bm, bk), lambda i, j, kk, gids: (i, kk), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, bk, bn),
                    lambda i, j, kk, gids: (gids[i], kk, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, kk, gids: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(gids, a_p, b_p)

    return out[:m, :n]
