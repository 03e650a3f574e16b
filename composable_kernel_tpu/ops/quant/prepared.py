"""Prepared (load-time) weight layouts for the quantized decode GEMMs.

The decode kernels are HBM-bound: every byte of non-weight work in the
serving step is lost bandwidth. Two host-side transforms in the GEMM
wrappers turned out to dominate the measured gap to speed-of-light when
the weights are jit *arguments* (the serving reality — params flow through
``jax.jit``/``lax.scan``):

  - ``pad_to(b, (None, bn))`` when the N block doesn't divide N: a full
    HBM copy of the weight matrix. XLA does NOT hoist it out of
    ``fori_loop``/``scan`` bodies, so every decode step paid a ~22 MB copy
    at Llama FFN sizes (measured: 375 -> 663 GB/s at M=8 K=4096 N=11008
    just by making bn divide N).
  - ``_expand_group_scales``: the per-K-step scale-row gather (and the
    w4a8 hi-half /16) — ~2.8 MB of traffic per call at N=11008, ~15-18%
    of a decode step.

Both are weight-only functions of (shape, config): compute them ONCE at
weight-load time and carry the results in the param tree. ``prepare_*``
returns a :class:`PreparedWeights` pytree; the GEMM wrappers accept it in
place of ``(b_q, scales)`` and skip straight to the pallas_call.

CK analog: the Argument/descriptor split — ``device_op.MakeArgument(...)``
precomputes the grid/layout descriptors once, and ``Run`` only launches
(``include/ck/tensor_operation/gpu/device/device_gemm_dequantB.hpp:24``,
``device_base.hpp`` Argument structs). Here the descriptor is data (padded
B + expanded scale blocks) rather than template state, because XLA owns
the schedule.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from composable_kernel_tpu import indexing
from composable_kernel_tpu.ops.gemm.config import GemmConfig

__all__ = [
    "PreparedWeights",
    "prepare_wo_quant",
    "prepare_w4a8",
    "prepare_w8a8",
]

_SCALE_SUBLANES = 8


@jax.tree_util.register_pytree_node_class
@dataclass
class PreparedWeights:
    """Load-time weight descriptor: padded B + per-K-step scale blocks.

    Children (traced leaves): b_p, scales_p, s_lo, s_hi.
    Aux (static): everything the kernel grid needs. The decode block shape
    (bn, bk/bpk) is FROZEN here — it determines the scale expansion — but
    block_m stays per-call (it only depends on the activation batch).
    """

    # traced leaves
    b_p: Any            # [Kb, Np] int8 (padded to bn multiples once)
    scales_p: Any       # [G, Np] f32 (or [1, Np] per-channel) — raw, padded
    s_lo: Any           # [n_k_steps * srb, Np] f32 expanded blocks (or None)
    s_hi: Any           # same, hi nibbles (w4a8: pre-divided by 16; or None)
    # static aux
    kind: str = field(default="w4a16")   # "w4a16" | "w8a16" | "w4a8"
    n: int = 0          # true (unpadded) N
    k: int = 0
    group_size: int | None = None
    pack_blocks: int = 1
    bn: int = 0
    bk: int = 0
    bpk: int = 0        # packed rows per K-step (int4 kinds)
    n_k_steps: int = 0
    s_rows: int = 0
    srb: int = 0
    vmem_limit_mb: int | None = None

    def tree_flatten(self):
        children = (self.b_p, self.scales_p, self.s_lo, self.s_hi)
        aux = (self.kind, self.n, self.k, self.group_size, self.pack_blocks,
               self.bn, self.bk, self.bpk, self.n_k_steps, self.s_rows,
               self.srb, self.vmem_limit_mb)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        b_p, scales_p, s_lo, s_hi = children
        (kind, n, k, group_size, pack_blocks, bn, bk, bpk, n_k_steps,
         s_rows, srb, vmem_limit_mb) = aux
        return cls(b_p=b_p, scales_p=scales_p, s_lo=s_lo, s_hi=s_hi,
                   kind=kind, n=n, k=k, group_size=group_size,
                   pack_blocks=pack_blocks, bn=bn, bk=bk, bpk=bpk,
                   n_k_steps=n_k_steps, s_rows=s_rows, srb=srb,
                   vmem_limit_mb=vmem_limit_mb)

    @property
    def np_(self) -> int:
        return self.b_p.shape[1]

    def decode_config(self, m: int) -> GemmConfig:
        return GemmConfig(
            block_m=32 if m <= 32 else 64,
            block_n=self.bn, block_k=self.bk,
            vmem_limit_mb=self.vmem_limit_mb,
        )


def _expand_scales(scales_p, row_starts, s_rows):
    idx, srb = indexing.group_scale_row_table(
        row_starts, s_rows, sublanes=_SCALE_SUBLANES
    )
    return jnp.take(scales_p, jnp.asarray(idx), axis=0), srb


def _pad_cols(x, np_):
    if x.shape[-1] == np_:
        return x
    return jnp.pad(x, ((0, 0), (0, np_ - x.shape[-1])))


def _decode_blocks(kind: str, n: int, k: int, config: GemmConfig | None):
    """Frozen decode (bn, bk, vmem) per family; bn snapped so padding is a
    one-time prepare cost (any bn works — Np = ceil(n/bn)*bn)."""
    if config is not None:
        return config.block_n, config.block_k, config.vmem_limit_mb
    if kind == "w4a8":
        from composable_kernel_tpu.ops.quant.w4a8 import _w4a8_heuristic

        cfg = _w4a8_heuristic(8, n, k)
    elif kind == "w8a8":
        from composable_kernel_tpu.ops.quant.w4a8 import _w4a8_heuristic

        # w8a8_gemm's default: same tiles, block_k halved to keep byte
        # footprint parity with the packed-int4 stream (w4a8.py:w8a8_gemm)
        cfg = _w4a8_heuristic(8, n, k)
        cfg = cfg.replace(block_k=max(512, cfg.block_k // 2))
    else:
        from composable_kernel_tpu.ops.quant.api import _heuristic_config

        cfg = _heuristic_config(8, n, k)
    return cfg.block_n, cfg.block_k, cfg.vmem_limit_mb


def prepare_wo_quant(
    b_q,
    scales,
    *,
    group_size: int | None = None,
    packed_int4: bool = False,
    pack_blocks: int = 1,
    config: GemmConfig | None = None,
):
    """Prepare weight-only-dequant (W4A16/W8A16) weights for decode serving.

    b_q/scales exactly as :func:`~composable_kernel_tpu.ops.quant.dequant_gemm`
    takes them. Returns a :class:`PreparedWeights` accepted by
    ``dequant_gemm(a, prepared)`` / ``wo_quant_gemm(a, prepared)``.
    """
    kb, n = b_q.shape
    k = kb * 2 if packed_int4 else kb
    kind = "w4a16" if packed_int4 else "w8a16"
    per_channel = group_size is None
    scales = jnp.asarray(scales, jnp.float32)
    if per_channel:
        assert scales.shape == (n,), scales.shape
        scales = scales.reshape(1, -1)
    else:
        assert scales.shape == (k // group_size, n), scales.shape

    bn, bk, vmem = _decode_blocks(kind, n, k, config)
    bn = max(128, -(-min(bn, n) // 128) * 128)
    bk = max(256, -(-bk // 256) * 256)
    if not per_channel:
        bk = (bk // group_size) * group_size if bk >= group_size else group_size
    np_ = -(-n // bn) * bn
    b_p = _pad_cols(b_q, np_)
    scales_p = _pad_cols(scales, np_)

    if packed_int4:
        assert k % (2 * pack_blocks) == 0
        half_seg = k // (2 * pack_blocks)
        bpk = indexing.fit_packed_block(
            bk // 2 if bk // 2 >= 128 else bk, half_seg,
            None if per_channel else group_size,
        )
        assert half_seg % bpk == 0
        n_k_steps = (k // 2) // bpk
    else:
        bpk = 0
        bk = min(bk, -(-k // 256) * 256)
        n_k_steps = -(-k // bk)

    if per_channel:
        s_lo = s_hi = None
        s_rows, srb = 1, 1
    else:
        blk = bpk if packed_int4 else bk
        s_rows = max(1, blk // group_size)
        if packed_int4:
            lo_starts, hi_starts = indexing.split_halves_scale_starts(
                n_k_steps, bpk, half_seg, group_size
            )
            s_lo, srb = _expand_scales(scales_p, lo_starts, s_rows)
            s_hi, _ = _expand_scales(scales_p, hi_starts, s_rows)
        else:
            lo_starts = [(i * blk) // group_size for i in range(n_k_steps)]
            s_lo, srb = _expand_scales(scales_p, lo_starts, s_rows)
            s_hi = s_lo

    return PreparedWeights(
        b_p=b_p, scales_p=scales_p, s_lo=s_lo, s_hi=s_hi, kind=kind,
        n=n, k=k, group_size=group_size, pack_blocks=pack_blocks,
        bn=bn, bk=bk, bpk=bpk, n_k_steps=n_k_steps, s_rows=s_rows, srb=srb,
        vmem_limit_mb=vmem,
    )


def prepare_w8a8(b_q, w_scales, *, config: GemmConfig | None = None):
    """Prepare dynamic-W8A8 weights for decode serving.

    b_q [K, N] int8 / w_scales [N] f32 exactly as
    :func:`~composable_kernel_tpu.ops.quant.w8a8_gemm` takes them. The
    prepared leaf pads B and the per-channel scales to the decode N block
    ONCE (the vocab-sized lm_head otherwise re-pads ~128 MB per decode
    step inside the jit — XLA does not hoist it out of scan bodies).
    """
    k, n = b_q.shape
    assert jnp.dtype(b_q.dtype) == jnp.int8
    w_scales = jnp.asarray(w_scales, jnp.float32)
    assert w_scales.shape == (n,), w_scales.shape

    bn, bk, vmem = _decode_blocks("w8a8", n, k, config)
    bn = max(128, -(-min(bn, n) // 128) * 128)
    np_ = -(-n // bn) * bn
    b_p = _pad_cols(b_q, np_)
    scales_p = _pad_cols(w_scales.reshape(1, -1), np_)

    return PreparedWeights(
        b_p=b_p, scales_p=scales_p, s_lo=None, s_hi=None, kind="w8a8",
        n=n, k=k, group_size=None, pack_blocks=1,
        bn=bn, bk=bk, bpk=0, n_k_steps=-(-k // bk), s_rows=1, srb=1,
        vmem_limit_mb=vmem,
    )


def prepare_w4a8(
    b_packed,
    scales,
    *,
    group_size: int,
    pack_blocks: int = 1,
    config: GemmConfig | None = None,
):
    """Prepare W4A8 (AND-only pack) weights for decode serving.

    b_packed/scales exactly as :func:`~composable_kernel_tpu.ops.quant.w4a8_gemm`
    takes them (``dtypes.pack_int4_w4a8`` layout). The hi-half scale rows
    are pre-divided by 16 here (the x16 of the AND-extracted high nibble).
    """
    kb, n = b_packed.shape
    k = kb * 2
    assert k % group_size == 0
    scales = jnp.asarray(scales, jnp.float32)
    assert scales.shape == (k // group_size, n), scales.shape

    bn, bk, vmem = _decode_blocks("w4a8", n, k, config)
    bn = max(128, -(-min(bn, n) // 128) * 128)
    bk = max(256, -(-bk // 256) * 256)
    np_ = -(-n // bn) * bn
    b_p = _pad_cols(b_packed, np_)
    scales_p = _pad_cols(scales, np_)

    assert k % (2 * pack_blocks) == 0
    half_seg = k // (2 * pack_blocks)
    bpk = indexing.fit_packed_block(
        bk // 2 if bk // 2 >= 128 else bk, half_seg, group_size
    )
    assert half_seg % bpk == 0
    n_k_steps = kb // bpk
    s_rows = max(1, bpk // group_size)

    lo_starts, hi_starts = indexing.split_halves_scale_starts(
        n_k_steps, bpk, half_seg, group_size
    )
    s_lo, srb = _expand_scales(scales_p, lo_starts, s_rows)
    s_hi, _ = _expand_scales(scales_p * (1.0 / 16.0), hi_starts, s_rows)

    return PreparedWeights(
        b_p=b_p, scales_p=scales_p, s_lo=s_lo, s_hi=s_hi, kind="w4a8",
        n=n, k=k, group_size=group_size, pack_blocks=pack_blocks,
        bn=bn, bk=bk, bpk=bpk, n_k_steps=n_k_steps, s_rows=s_rows, srb=srb,
        vmem_limit_mb=vmem,
    )
