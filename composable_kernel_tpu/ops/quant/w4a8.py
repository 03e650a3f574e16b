"""W4A8 GEMM: int4 weights x int8 per-token activations on the int8 MXU.

The decode-regime lever identified in docs/performance.md: the W4A16 path
tops out at ~70% of HBM speed-of-light because every packed byte pays an
i32-widen + two shifts + bf16 convert chain on the VPU (measured VPU roof,
scripts/probe_magic_unpack.py). This kernel removes that chain entirely:

  - weights are packed with ``dtypes.pack_int4_w4a8``: high nibble stores
    ``W[k + K/2]`` SIGNED, low nibble stores ``W[k] + 8`` offset-binary.
    In-kernel extraction is two int8 bitwise ANDs — no shifts (Mosaic has
    no i8 vector shifts), no width-changing bitcasts (each is a sublane
    relayout), no float converts on the weight stream:

        h16 = packed & 0xF0   == 16 * w_hi   (sign bit preserved)
        l8  = packed & 0x0F   ==  w_lo + 8   (in [0, 15])

  - both nibble tiles feed ``jnp.dot(int8, int8) -> int32`` on the MXU's
    native int8 path (2x the bf16 MXU peak).
  - the x16 folds into the high-half group scale (pre-divided by 16 on the
    host — exact, power of two); the +8 offset folds into a per-group
    rowsum correction computed on the *activation* tile (small), not the
    weight stream:  corr[m] = 8 * sum_{k in group} a_q[m, k].
  - per-token activation scales ``a_s[m]`` are constant along K and N, so
    they apply once on the accumulator in the epilogue.

CK analogs (cited per CLAUDE.md style):
  - ``device_gemm_dequantB.hpp:24`` — the (A, B, scale, C) signature.
  - ``element/unary_element_wise_operation.hpp:1061-1094``
    (FastNumericArrayConverter) — the offset-binary nibble trick,
    retargeted at the int8 MXU instead of fp16 bit-twiddling.
  - ``quantization_operation.hpp:25-251`` — activation-quant epilogues.
  - ``gridwise_fpAintB_gemm_wmma.hpp:553-570`` — B stays quantized until
    the last possible moment (here: all the way INTO the MXU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu import indexing
from composable_kernel_tpu.ops.gemm.config import GemmConfig
from composable_kernel_tpu.ops.gemm.kernel import (
    _ceil_mult,
    _interpret_default,
    pad_to,
)
from composable_kernel_tpu.ops.quant.kernel import _expand_group_scales

__all__ = ["quantize_act_token", "w4a8_gemm", "w8a8_gemm"]

_I8_SUBLANES = 32  # int8 sublane tile: i8 blocks need 32-row alignment


def quantize_act_token(x, qmax: int = 127):
    """Per-token symmetric int8 activation quant: (x_q [M,K] i8, s [M,1] f32).

    Pure-jnp on purpose: XLA fuses the absmax/scale/round chain into the
    producer (usually the preceding norm), so a Pallas kernel buys nothing.
    The scale uses an explicit multiply-by-reciprocal (not ``/ qmax``): XLA
    rewrites division-by-constant to that form under jit but NOT eagerly,
    so only the explicit multiply is bit-stable across jit boundaries and
    between XLA and Mosaic (the fused in-kernel quant in ``w4a8_gemm`` must
    reproduce this bit-for-bit).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(absmax * jnp.float32(1.0 / qmax), 1e-8)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -qmax, qmax)
    return x_q.astype(jnp.int8), s.astype(jnp.float32)


def _w4a8_heuristic(m: int, n: int, k: int) -> GemmConfig:
    """Measured-default blocks for the int8-MXU path (v5e sweeps).

    Decode differs from the bf16-dequant kernel's whole-N preference:
    W4A8's critical path is in-kernel compute (2 int8 ANDs + 2 dot sets),
    not a convert, so it wants >=3-4 grid steps of N x K to pipeline DMA
    under compute. Measured M=8 K=4096: N=11008 whole 586 vs bn=3712
    632 GB/s; N=14336 bn=3584 659. Small N (<=4096) and deep K stay
    whole-N (N=4096 K=11008: whole 489 vs split 397 — the long k-loop
    already pipelines, splitting just re-runs the epilogue).
    """
    if m <= 64:
        import os

        mode = os.environ.get("CKT_W4A8_BN", "hybrid")
        if n <= 4096 or mode == "whole" or (mode == "hybrid" and n > 32768):
            from composable_kernel_tpu.ops.quant.api import _decode_bn

            bn = _decode_bn(n) if n > 4096 else -(-n // 128) * 128
        else:
            nb = -(-n // 4096)
            bn = -(-(-(-n // nb)) // 128) * 128
        # never let the N block force a per-call weight pad (see
        # indexing.snap_divisor_bn): N=11008 measured 663 GB/s at the
        # dividing 5504 vs 375 at the padded 3712 when weights are jit args
        bn = indexing.snap_divisor_bn(n, bn)
        return GemmConfig(
            block_m=32 if m <= 32 else 64, block_n=bn, block_k=1024,
            vmem_limit_mb=80,
        )
    if m % 384 == 0 and 1024 <= n <= 4096 and n % 128 == 0:
        # prefill: the int8 A tiles halve the VMEM of the bf16 kernel's, so
        # a shallower M panel pipelines better (222 vs 218 TOPs at the
        # 3840x4096x4096 headline vs the shared 768-row default)
        return GemmConfig(block_m=384, block_n=n, block_k=1024,
                          vmem_limit_mb=64)
    from composable_kernel_tpu.ops.quant.api import _heuristic_config

    cfg = _heuristic_config(m, n, k)
    # the fused-quant path keeps BOTH the bf16 A block and the int8
    # act-quant scratch resident at full K, so mid-M shapes sit over the
    # shared heuristic's scoped limits: the chunk-wave e_n=2 bucket
    # (m=1024, K=14336) measured 64.08M vs the 64 MB raise, and the
    # m=1024 prepared-lm_head forward (n=129k) needs 19.4M vs the 16 MB
    # default. The raise is a cap, not an allocation — 80 MB is the same
    # ceiling the decode path already runs at.
    return cfg.replace(vmem_limit_mb=max(cfg.vmem_limit_mb or 0, 80))


def _kernel_w4a8(
    a_lo_ref, a_hi_ref, b_ref, s_lo_ref, s_hi_ref, as_ref, *rest,
    n_ds, c_op, n_k_steps, s_rows, gsz, external_corr,
    fused_quant=False, bpk=0, half_seg=0,
    fused_norm=False, true_k=0, eps=1e-6,
):
    """Grid = (m, n, k) over packed K-steps.

    rest = ([corr], *ds, out, acc_scratch[, aq_scratch, as_scratch]).
    s_hi rows are pre-divided by 16.

    Fused activation quant (``fused_quant``): a_lo_ref/a_hi_ref alias ONE
    bf16 [bm, K] block (full K rows, DMA'd once per m-block); at k-step 0
    the kernel computes the per-token absmax/scale/round in-VMEM into an
    int8 scratch (bit-identical to ``quantize_act_token``), and every
    K-step slices its lo/hi nibble columns out of the scratch. This is the
    serving-honest path: the unfused XLA act-quant costs more than the
    whole decode GEMM at M<=64 (BENCH_r02: 361 vs 632 GB/s kernel-only).
    CK analog: fused pre-op transfer in
    thread_group_tensor_slice_transfer_v4r1_dequant.hpp, inverted to
    quantize A rather than dequantize B.

    Offset-correction placement (both measured on v5e, see w4a8_gemm):
      - inline (decode default): per group, subtract 8 * rowsum(a_lo_group)
        from the int32 dot — exact, costs one small [bm, gsz] reduce per
        group on the A tile.
      - external (prefill default): ``corr`` precomputed outside the kernel
        from activation group-sums and subtracted once in the epilogue —
        zero per-group work, but one extra [M, N] f32 HBM round-trip.
    """
    if external_corr:
        corr_ref = rest[0]
        rest = rest[1:]
    d_refs = rest[:n_ds]
    out_ref = rest[n_ds]
    acc_ref = rest[n_ds + 1]
    k_idx = pl.program_id(2)

    if fused_quant:
        aq_ref = rest[n_ds + 2]
        as_scr = rest[n_ds + 3]

        @pl.when(k_idx == 0)
        def _quant():
            # bit-identical to quantize_act_token: f32 absmax over the full
            # row, s = max(absmax/127, 1e-8), round-half-even, clip.
            x = a_lo_ref[...].astype(jnp.float32)
            if fused_norm:
                # the decode megakernel front: rmsnorm folded ahead of the
                # act-quant on the resident A block (same f32 chain as
                # normalization._rmsnorm_quant_kernel; as_ref carries gamma
                # [1, K] on this path). Kills one pallas launch + one int8
                # HBM round-trip per fusion site per layer.
                ms = jnp.sum(x * x, axis=1, keepdims=True) * (1.0 / true_k)
                x = x * jax.lax.rsqrt(ms + eps) * as_ref[...].astype(
                    jnp.float32
                )
            absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
            s = jnp.maximum(absmax * jnp.float32(1.0 / 127.0), 1e-8)
            aq_ref[...] = jnp.clip(
                jnp.round(x / s), -127.0, 127.0
            ).astype(jnp.int8)
            as_scr[...] = jnp.broadcast_to(s, as_scr.shape)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = b_ref[...]
    # AND-only nibble extraction (see module docstring). 0xF0 as int8 is -16.
    l8 = packed & jnp.int8(0x0F)          # w_lo + 8, in [0, 15]
    h16 = packed & jnp.int8(-16)          # 16 * w_hi, sign preserved
    if fused_quant:
        # logical column offsets of this packed step's nibbles (the in-kernel
        # form of indexing.split_halves_a_block; offsets are bpk-aligned
        # because half_seg % bpk == 0)
        p0 = k_idx * bpk
        seg_base = (p0 // half_seg) * (2 * half_seg)
        off = p0 % half_seg
        lo_c = pl.multiple_of(seg_base + off, 128)
        hi_c = pl.multiple_of(seg_base + off + half_seg, 128)
        a_lo = aq_ref[:, pl.ds(lo_c, bpk)]
        a_hi = aq_ref[:, pl.ds(hi_c, bpk)]
    else:
        a_lo = a_lo_ref[...]
        a_hi = a_hi_ref[...]
    acc = acc_ref[...]
    for r in range(s_rows):
        ks = slice(r * gsz, (r + 1) * gsz)
        sl = s_lo_ref[r : r + 1]          # [1, bn] f32
        sh = s_hi_ref[r : r + 1]          # [1, bn] f32 (already / 16)
        a_lo_r = a_lo[:, ks]
        d_lo = jnp.dot(a_lo_r, l8[ks], preferred_element_type=jnp.int32)
        d_hi = jnp.dot(a_hi[:, ks], h16[ks], preferred_element_type=jnp.int32)
        if not external_corr:
            rs = jnp.sum(a_lo_r.astype(jnp.int32), axis=1, keepdims=True)
            d_lo = d_lo - 8 * rs
        # one fused accumulator pass per group (the scale-accumulate is the
        # only per-group VPU work on the [bm, bn] tile)
        acc = acc + (d_lo.astype(jnp.float32) * sl + d_hi.astype(jnp.float32) * sh)
    acc_ref[...] = acc

    @pl.when(k_idx == n_k_steps - 1)
    def _finish():
        res = acc_ref[...]
        if external_corr:
            res = res - corr_ref[...]
        if fused_quant:
            res = res * as_scr[:, :1]     # [bm, 1] per-token scale broadcast
        else:
            res = res * as_ref[...]       # [bm, 1] per-token scale broadcast
        if c_op is not None:
            res = c_op(res, *[d[...] for d in d_refs])
        out_ref[...] = res.astype(out_ref.dtype)


def w4a8_gemm(
    a_q,
    a_scales,
    b_packed,
    scales=None,
    ds=(),
    *,
    group_size: int | None = None,
    pack_blocks: int = 1,
    config: GemmConfig | None = None,
    c_op=None,
    out_dtype=jnp.bfloat16,
    offset_corr: str | None = None,  # "inline" | "external" | None (auto)
    gamma=None,
    norm_eps: float = 1e-6,
    interpret: bool | None = None,
):
    """C[M, N] = c_op(a_s * (A_q @ (W_int4 * g_scales)), *Ds), int8 MXU dots.

    a_q:      [M, K] int8 per-token-quantized activations
              (``quantize_act_token``) — OR, with ``a_scales=None``, raw
              [M, K] bf16/f32 activations: the per-token quant then runs
              fused inside the kernel on the resident A tile (the honest
              serving-step path; see _kernel_w4a8).
    a_scales: [M] or [M, 1] f32 per-token scales (None = fused act-quant)
    gamma:    optional [K] rmsnorm weight (requires ``a_scales=None``):
              the decode MEGAKERNEL front — rmsnorm + act-quant + GEMM in
              ONE launch, equivalent to
              ``w4a8_gemm(*rmsnorm_quant(x, gamma), ...)`` (CK's
              fused-epilogue composition stance inverted to a fused
              PRE-op, device_gemm_multiple_d.hpp:33).
    b_packed: [K//2, N] int8, ``dtypes.pack_int4_w4a8`` layout
              (``pack_blocks`` > 1 for the TP row-block layout) — OR a
              :class:`~composable_kernel_tpu.ops.quant.prepared.PreparedWeights`
              from ``prepare_w4a8`` (then ``scales``/``group_size`` are
              taken from it; the serving fast path: no per-call weight
              padding or scale expansion)
    scales:   [K // group_size, N] f32 group scales
    """
    from composable_kernel_tpu.ops.quant.prepared import PreparedWeights

    prepared = b_packed if isinstance(b_packed, PreparedWeights) else None
    if prepared is not None:
        assert prepared.kind == "w4a8", prepared.kind
        assert scales is None and group_size is None and pack_blocks == 1
        mismatch = config is not None and (
            config.block_n != prepared.bn or config.block_k != prepared.bk
        )
        if mismatch or (config is None and a_q.shape[0] > 64):
            # prefill / explicit-config calls re-run the generic path on the
            # prepared (padded) arrays; only the frozen decode blocks ride
            # the expanded scales
            out = w4a8_gemm(
                a_q, a_scales, prepared.b_p, prepared.scales_p, ds,
                group_size=prepared.group_size,
                pack_blocks=prepared.pack_blocks, config=config, c_op=c_op,
                out_dtype=out_dtype, offset_corr=offset_corr,
                gamma=gamma, norm_eps=norm_eps, interpret=interpret,
            )
            return out[:, : prepared.n] if out.shape[1] != prepared.n else out
        b_packed = prepared.b_p
        scales = prepared.scales_p
        group_size = prepared.group_size
        pack_blocks = prepared.pack_blocks
    assert group_size is not None
    m, k = a_q.shape
    kb, n = b_packed.shape
    assert kb * 2 == k, f"K mismatch: A has {k}, packed B implies {kb * 2}"
    fused_quant = a_scales is None
    fused_norm = gamma is not None
    if fused_quant:
        assert jnp.issubdtype(a_q.dtype, jnp.floating), (
            "a_scales=None (fused act-quant) needs float activations, got "
            f"{a_q.dtype}"
        )
        assert offset_corr != "external", (
            "external offset correction needs host-side a_q; use inline"
        )
    else:
        assert jnp.dtype(a_q.dtype) == jnp.int8, a_q.dtype
        assert not fused_norm, "gamma (fused norm) requires a_scales=None"
    if fused_norm:
        gamma = jnp.asarray(gamma, jnp.float32).reshape(1, k)
    assert k % group_size == 0
    assert scales.shape == (k // group_size, n), scales.shape
    assert (k // 2) % group_size == 0 or group_size % (k // 2) == 0
    if interpret is None:
        interpret = _interpret_default()
    scales = jnp.asarray(scales, jnp.float32)
    if not fused_quant:
        a_scales = jnp.asarray(a_scales, jnp.float32).reshape(m, 1)

    if config is None:
        config = (prepared.decode_config(m) if prepared is not None
                  else _w4a8_heuristic(m, n, k))
    cfg = config.shrink_to(m, n, k)
    # int8 A blocks need 32-row sublane alignment
    bm = max(_I8_SUBLANES, -(-cfg.block_m // _I8_SUBLANES) * _I8_SUBLANES)
    bn = max(128, -(-cfg.block_n // 128) * 128)
    bm = min(bm, _ceil_mult(m, _I8_SUBLANES))
    bn = min(bn, _ceil_mult(n, 128))

    assert k % (2 * pack_blocks) == 0
    half_seg = k // (2 * pack_blocks)  # packed rows per segment
    bk = max(256, -(-cfg.block_k // 256) * 256)
    bpk = indexing.fit_packed_block(
        bk // 2 if bk // 2 >= 128 else bk, half_seg, group_size
    )
    assert half_seg % bpk == 0, (
        f"packed segment {half_seg} must be divisible by packed block {bpk}"
    )
    n_k_steps = kb // bpk
    s_rows = max(1, bpk // group_size)
    gsz = bpk // s_rows  # packed rows per scale row

    if fused_quant and bpk % 128 != 0:
        # in-kernel nibble slices need lane-aligned offsets; tiny misaligned
        # shapes (test-only) fall back to the host quant + kernel path
        if fused_norm:
            from composable_kernel_tpu.ops import normalization as norm_ops

            aq_f, as_f = norm_ops.rmsnorm_quant(
                a_q, gamma.reshape(-1), eps=norm_eps, interpret=interpret
            )
        else:
            aq_f, as_f = quantize_act_token(a_q)
        return w4a8_gemm(
            aq_f, as_f, b_packed, scales, ds, group_size=group_size,
            pack_blocks=pack_blocks, config=config, c_op=c_op,
            out_dtype=out_dtype, offset_corr=offset_corr, interpret=interpret,
        )

    # ---- lo-nibble offset correction placement --------------------------
    # The lo nibbles store w + 8; the +8 contributes
    #   8 * sum_{g in lo-rows} s[g, n] * sum_{k in g} a_q[m, k].
    # "external": compute it here from activation group-sums and subtract
    # once in the epilogue. "inline": subtract 8*rowsum per group in-kernel.
    # Measured on v5e (scripts/bench_w4a8.py): inline wins at every decode
    # shape (585 vs 549 GB/s at M=1, and the gap widens with M — the
    # external [M, G, N] broadcast-reduce is O(M*G*N) VPU work plus an
    # [M, N] f32 HBM round-trip, while the in-kernel [bm, gsz] rowsum is
    # negligible); external also adds bm*bn*4 bytes to the VMEM working
    # set, OOM-ing whole-N prefill blocks. Inline is the default; external
    # stays as a measured-and-documented alternative.
    if offset_corr is None:
        offset_corr = "inline"
    external_corr = offset_corr == "external"
    if external_corr:
        lo_mask = np.zeros((k,), np.float32)
        for sgi in range(pack_blocks):
            base = sgi * 2 * half_seg
            lo_mask[base : base + half_seg] = 1.0
        a_lo_f = a_q.astype(jnp.float32) * jnp.asarray(lo_mask)
        gsum = a_lo_f.reshape(m, k // group_size, group_size).sum(-1)
        # NOT a matmul: corr cancels against a same-magnitude term inside
        # the accumulator, and TPU f32 matmuls lower to one-pass bf16 MXU
        # (even at Precision.HIGHEST) — bf16-rounding the correction is
        # catastrophic. The broadcast-reduce keeps every multiply exact f32
        # on the VPU, the same arithmetic as the kernel's scale-accumulate.
        corr = 8.0 * jnp.sum(gsum[:, :, None] * scales[None, :, :], axis=1)

    # ---- pad operands ---------------------------------------------------
    a_p = pad_to(a_q, (bm, None))
    b_p = pad_to(b_packed, (None, bn))
    as_p = None if fused_quant else pad_to(a_scales, (bm, None))
    corr_ops = [pad_to(corr, (bm, bn))] if external_corr else []
    corr_specs = (
        [pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM)]
        if external_corr
        else []
    )
    mp, np_ = a_p.shape[0], b_p.shape[1]

    # ---- scale blocks: one srb-row block per K-step, hi rows / 16 -------
    if prepared is not None:
        assert bpk == prepared.bpk and bn == prepared.bn, (
            (bpk, bn), (prepared.bpk, prepared.bn)
        )
        s_lo, s_hi, srb = prepared.s_lo, prepared.s_hi, prepared.srb
    else:
        s_p = pad_to(scales, (None, bn))
        lo_starts, hi_starts = indexing.split_halves_scale_starts(
            n_k_steps, bpk, half_seg, group_size
        )
        s_lo, srb = _expand_group_scales(s_p, lo_starts, s_rows)
        s_hi, _ = _expand_group_scales(s_p * (1.0 / 16.0), hi_starts, s_rows)
    scale_spec = pl.BlockSpec(
        (srb, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
    )

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
    out_shape = jax.ShapeDtypeStruct((mp, np_), out_dtype)
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM)

    flops = 2 * mp * np_ * k
    bytes_accessed = int(
        mp * k + kb * np_ + s_lo.size * 8
        + mp * np_ * jnp.dtype(out_dtype).itemsize
    )
    cost = pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed, transcendentals=0)
    cparams = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
        vmem_limit_bytes=(
            cfg.vmem_limit_mb * 1024 * 1024 if cfg.vmem_limit_mb else None
        ),
    )

    kernel = functools.partial(
        _kernel_w4a8,
        n_ds=len(ds_p), c_op=c_op, n_k_steps=n_k_steps, s_rows=s_rows, gsz=gsz,
        external_corr=external_corr, fused_quant=fused_quant,
        bpk=bpk, half_seg=half_seg,
        fused_norm=fused_norm, true_k=k, eps=norm_eps,
    )
    b_spec = pl.BlockSpec(
        (bpk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
    )
    scratch_shapes = [pltpu.VMEM((bm, bn), jnp.float32)]
    if fused_quant:
        # one full-K bf16 A block per m-row (DMA'd once per i), quantized
        # in-kernel at k-step 0 into the int8 scratch; with fused_norm the
        # gamma row rides the (otherwise unused) as_ref operand slot
        kernel_inner = kernel

        if fused_norm:
            def kernel_f(a_ref, g_ref, b_ref, s_lo_ref, s_hi_ref, *rest):
                return kernel_inner(
                    a_ref, a_ref, b_ref, s_lo_ref, s_hi_ref, g_ref, *rest
                )
        else:
            def kernel_f(a_ref, b_ref, s_lo_ref, s_hi_ref, *rest):
                return kernel_inner(
                    a_ref, a_ref, b_ref, s_lo_ref, s_hi_ref, None, *rest
                )

        gamma_specs = (
            [pl.BlockSpec((1, k), lambda i, j, kk: (0, 0),
                          memory_space=pltpu.VMEM)]
            if fused_norm else []
        )
        gamma_ops = [gamma] if fused_norm else []
        in_specs = [
            pl.BlockSpec(
                (bm, k), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM
            ),
            *gamma_specs,
            b_spec,
            scale_spec,
            scale_spec,
            *corr_specs,
            *d_specs,
        ]
        operands = (a_p, *gamma_ops, b_p, s_lo, s_hi, *corr_ops, *ds_p)
        scratch_shapes += [
            pltpu.VMEM((bm, k), jnp.int8),
            pltpu.VMEM((bm, 128), jnp.float32),
        ]
        kernel = kernel_f
    else:
        in_specs = [
            # A columns for the step's lo / hi nibbles (segment-aware)
            pl.BlockSpec(
                (bm, bpk),
                lambda i, j, kk: (
                    i,
                    indexing.split_halves_a_block(kk, bpk, half_seg, hi=False),
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bm, bpk),
                lambda i, j, kk: (
                    i,
                    indexing.split_halves_a_block(kk, bpk, half_seg, hi=True),
                ),
                memory_space=pltpu.VMEM,
            ),
            b_spec,
            scale_spec,
            scale_spec,
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            *corr_specs,
            *d_specs,
        ]
        operands = (a_p, a_p, b_p, s_lo, s_hi, as_p, *corr_ops, *ds_p)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            scratch_shapes=scratch_shapes,
        ),
        compiler_params=cparams,
        cost_estimate=cost,
        interpret=interpret,
    )(*operands)

    n_true = prepared.n if prepared is not None else n
    if (mp, np_) != (m, n_true):
        out = out[:m, :n_true]
    return out


def w8a8_gemm(
    a_q,
    a_scales,
    b_q,
    w_scales=None,
    ds=(),
    *,
    config: GemmConfig | None = None,
    c_op=None,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """Dynamic W8A8 GEMM: per-token int8 activations x per-channel int8
    weights on the int8 MXU (the SmoothQuant-style serving path).

    One full-K int8 dot with int32 accumulation (``pallas_gemm``'s native
    int path — no unpack, no per-group work); both scale families commute
    with the K reduction, so the per-channel weight scale lands on the
    accumulator in-kernel and the per-token scale folds into the output
    epilogue outside (XLA fuses it with the slice). CK analogs:
    example/14_gemm_quantization's acc*scale requant, at per-token rather
    than per-tensor granularity (quantization_operation.hpp:25-251).

    a_q:      [M, K] int8 (``quantize_act_token``)
    a_scales: [M] or [M, 1] f32
    b_q:      [K, N] int8, or a ``prepare_w8a8`` :class:`PreparedWeights`
              (then ``w_scales`` must be omitted: the prepared leaf carries
              the once-padded B and scale row)
    w_scales: [N] f32 per-output-channel
    """
    from composable_kernel_tpu.ops.gemm.kernel import pallas_gemm
    from composable_kernel_tpu.ops.quant.prepared import PreparedWeights

    m, k = a_q.shape
    true_n = None
    if isinstance(b_q, PreparedWeights):
        assert b_q.kind == "w8a8" and w_scales is None
        assert b_q.k == k, (b_q.k, k)
        if config is None:
            config = b_q.decode_config(m)
        true_n = b_q.n
        ws = b_q.scales_p.reshape(-1)
        b_q = b_q.b_p
    else:
        assert w_scales.shape == (b_q.shape[1],), w_scales.shape
        ws = jnp.asarray(w_scales, jnp.float32)
    n = b_q.shape[1]
    assert jnp.dtype(a_q.dtype) == jnp.int8 and jnp.dtype(b_q.dtype) == jnp.int8
    a_scales = jnp.asarray(a_scales, jnp.float32).reshape(m, 1)

    if config is None:
        config = _w4a8_heuristic(m, n, k).replace(
            # full-size int8 B (no packing): halve block_k to keep the
            # same byte footprint per step as the packed-int4 tiles
            block_k=max(512, _w4a8_heuristic(m, n, k).block_k // 2)
        )

    def scale_op(acc, ws_row, *rest):
        out = acc.astype(jnp.float32) * ws_row
        if c_op is not None:
            out = c_op(out, *rest)
        return out

    out = pallas_gemm(
        a_q, b_q, (ws, *ds),
        config=config, c_op=scale_op, out_dtype=jnp.float32,
        interpret=interpret,
    )
    if true_n is not None and true_n != n:
        out = out[:, :true_n]
    return (out * a_scales).astype(out_dtype)
