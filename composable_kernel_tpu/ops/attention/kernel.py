"""Flash-attention forward Pallas kernel.

TPU re-design of CK's fused attention stack:

  - blockwise QK^T -> online softmax -> PV with running (max, sum) rescale:
    ``gridwise_batched_gemm_softmax_gemm_xdl_cshuffle_v1.hpp:699-925``
    ("Formula by Dao et al." :911) and the ck_tile FlashAttention-2 product
    ``ops/fmha/pipeline/block_fmha_pipeline_qr_ks_vs.hpp:126`` (gemm_0
    :303-331, rowmax :401-406, p=exp(s-m) :443-447, rescale + gemm_1).
  - masking: CK ``MaskingSpecialization`` (masking_specialization.hpp:10-54,
    MaskOutUpperTriangle) + ck_tile causal bottom-right / sliding window
    (``ops/fmha/block/block_masking.hpp``).
  - GQA/MQA head mapping (device_grouped_query_attention_forward_wmma.hpp):
    done in the K/V BlockSpec index maps — h_kv = h_q // group.
  - varlen: per-batch ``kv_seq_len`` masking (ck_tile group-mode seqstart
    analog, fmha_fwd_kernel.hpp:505-555) as scalar-prefetch data.
  - LSE output for split-KV flash-decoding combine
    (fmha_fwd_splitkv_kernel.hpp / fmha_fwd_splitkv_combine_kernel.hpp).
  - int8 KV cache: K/V stored int8 with per-head f32 scales, dequantized in
    VMEM at load (composition of the S2 dequant technique with attention).

Grid = (batch*heads, q blocks, kv blocks); the kv dim is sequential
("arbitrary") so the online-softmax state lives in VMEM scratch across
steps. Mosaic pipelines the K/V tile streams into VMEM (the analog of CK's
LDS double-buffering).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu import indexing
from composable_kernel_tpu.ops.attention.config import AttentionConfig
from composable_kernel_tpu.ops.gemm.kernel import _ceil_mult, _interpret_default, pad_to

__all__ = ["alibi_slopes_for_heads", "flash_attention", "flash_decode"]


def alibi_slopes_for_heads(n_heads: int):
    """Standard ALiBi geometric slopes (Press et al.): head i gets
    2**(-8 * (i + 1) / n_heads). CK analog: the get_alibi_slopes generator
    feeding block_position_encoding.hpp's Alibi struct."""
    import numpy as np

    return np.asarray(
        [2.0 ** (-8.0 * (i + 1) / n_heads) for i in range(n_heads)],
        np.float32,
    )

_NEG_INF = -1e30  # large-negative instead of -inf: keeps exp() NaN-free
_LANES = 128


def _tile_random_bits(shape, tile_seed, interpret_mode):
    """uint32 random bits per tile; hardware PRNG on TPU, a counter hash in
    interpret mode (pltpu.prng_* has no CPU lowering). Both deterministic
    per (seed, tile)."""
    if not interpret_mode:
        pltpu.prng_seed(tile_seed)
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    r = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (r * jnp.uint32(0x9E3779B9) ^ c * jnp.uint32(0x85EBCA6B)) + (
        jnp.uint32(1) * tile_seed.astype(jnp.uint32)
        if hasattr(tile_seed, "astype")
        else jnp.uint32(tile_seed)
    )
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> 15)
    x = x * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _fa_kernel(
    lens_ref,  # scalar prefetch: [2, B] int32 — row 0: kv lens, row 1: causal offsets
    *refs,
    has_bias: bool,
    has_alibi: bool,
    has_kv_scale: bool,
    return_lse: bool,
    scale: float,
    causal: bool,
    window: int | None,
    dropout_rate: float,
    dropout_seed: int,
    interpret_mode: bool,
    n_k_steps: int,
    bq: int,
    bk: int,
    heads_q: int,
    static_quant: tuple[float, float, float] | None = None,
    mxu_int8: bool = False,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    if has_alibi:
        alibi_ref = refs[idx]; idx += 1
    if has_kv_scale:
        k_scale_ref = refs[idx]; idx += 1
        v_scale_ref = refs[idx]; idx += 1
    o_ref = refs[idx]; idx += 1
    if return_lse:
        lse_ref = refs[idx]; idx += 1
    m_scr, l_scr, acc_scr = refs[idx], refs[idx + 1], refs[idx + 2]

    kv_idx = pl.program_id(2)
    q_blk = pl.program_id(1)
    bh = pl.program_id(0)
    batch = bh // heads_q

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # ---- block liveness: skip fully-masked KV tiles entirely ----------
    # causal: a KV block whose first key is beyond the block's last query
    # (plus alignment offset) is all-masked — half the blocks in causal
    # prefill. window: blocks wholly before the window are dead too. The
    # varlen clamp already redirects the DMA of dead blocks; this skips
    # their compute (CK analog: MaskingSpecialization block-level early-out,
    # gridwise_..._v1 loop bounds).
    live = kv_idx * bk < lens_ref[0, batch]
    if causal:
        live &= kv_idx * bk <= (q_blk + 1) * bq - 1 + lens_ref[1, batch]
    if window is not None:
        live &= kv_idx * bk + bk - 1 > q_blk * bq + lens_ref[1, batch] - window

    def _step(masked: bool):
        q = q_ref[0]  # [bq, D]
        k = k_ref[0]  # [bk, D]
        v = v_ref[0]  # [bk, Dv]
        if static_quant is not None:
            # CK fp8 static-quant pipeline structure
            # (block_fmha_pipeline_qr_ks_vs_fp8.hpp:241,316,452,504) on
            # v5e-native int8: QK^T on the int8 MXU with int32 acc, the
            # combined descale folded into the softmax scale (scale_s *
            # descale_qk analog).
            sq_s, sk_s, _ = static_quant
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (scale * sq_s * sk_s)
        elif mxu_int8 and has_kv_scale:
            # dynamic int8 QK^T: quantize the q tile per row in-VMEM and
            # ride the int8 MXU (2x bf16 peak) against the int8 K cache;
            # the per-row q scale and per-head k scale fold into one
            # broadcast multiply on s. Same pipeline structure as the CK
            # fp8 static-quant path, with dynamic instead of calibrated
            # scales (block_fmha_pipeline_qr_ks_vs_fp8.hpp:241,316).
            qf = q.astype(jnp.float32)
            q_abs = jnp.max(jnp.abs(qf), axis=1, keepdims=True)  # [bq, 1]
            q_s = jnp.maximum(q_abs * jnp.float32(1.0 / 127.0), 1e-12)
            q_i8 = jnp.clip(jnp.round(qf / q_s), -127, 127).astype(jnp.int8)
            s = jax.lax.dot_general(
                q_i8, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (q_s * (scale * k_scale_ref[0, 0, 0]))
        else:
            s_mul = scale
            if has_kv_scale:
                # int8 cache: one convert per tile; the per-head k scale
                # folds into the q pre-scale and the v scale into the
                # finish epilogue (both constant along the reduced axes) —
                # the 3-op dequant chain re-walked every KV byte on the VPU
                # once per q-block otherwise
                k = k.astype(q.dtype)
                v = v.astype(q.dtype)
                s_mul = scale * k_scale_ref[0, 0, 0]
            # pre-scale q ([bq, D] — bk/128x cheaper than scaling s) in f32
            # so tiny scales don't flush bf16
            q = (q.astype(jnp.float32) * s_mul).astype(q.dtype)
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [bq, bk]
        if has_bias:
            s = s + bias_ref[0].astype(jnp.float32)

        if masked or has_alibi:
            q_pos = (
                q_blk * bq
                + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
                + lens_ref[1, batch]  # causal alignment offset (may be traced)
            )
            k_pos = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        if has_alibi:
            # in-kernel alibi: bias = slope_h * (k_pos - q_pos), computed
            # from the position iotas — 2 flops/element instead of an
            # O(S^2 * H) HBM bias tensor. CK analog: Alibi struct slopes
            # applied per element inside the pipeline
            # (block_position_encoding.hpp:47-88).
            s = s + alibi_ref[0, 0, 0] * (k_pos - q_pos).astype(jnp.float32)
        if masked:
            mask = k_pos < lens_ref[0, batch]  # varlen + Sk padding
            if causal:
                mask &= k_pos <= q_pos
            if window is not None:
                mask &= k_pos > q_pos - window
            s = jnp.where(mask, s, _NEG_INF)

        # ---- online softmax (Dao et al.) ----
        m_prev = m_scr[...]  # [bq, LANES] broadcast storage
        row_max = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, row_max)  # broadcast -> [bq, LANES]
        corr = jnp.exp(m_prev - m_new)
        m_scr[...] = m_new
        int8_p = static_quant is not None or (mxu_int8 and has_kv_scale)

        if dropout_rate > 0.0:
            # training path (unchanged semantics): the denominator l uses
            # undropped p; only the PV path is masked + rescaled.
            # Deterministic per-tile seed so backward can regenerate the
            # mask (ck_tile block_dropout.hpp analog).
            p = jnp.exp(s - m_new[:, :1])  # [bq, bk]
            l_scr[...] = l_scr[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
            tile_seed = (
                dropout_seed
                + (bh * pl.num_programs(1) + q_blk) * pl.num_programs(2)
                + kv_idx
            )
            bits = _tile_random_bits(p.shape, tile_seed, interpret_mode)
            threshold = jnp.uint32(int(dropout_rate * (2**32 - 1)))
            keep = bits >= threshold
            p_v = jnp.where(keep, p, 0.0) * (1.0 / (1.0 - dropout_rate))
            if int8_p:
                p_q = jnp.clip(jnp.round(p_v * 127.0), 0, 127).astype(jnp.int8)
                dsv = (static_quant[2] if static_quant is not None else 1.0)
                pv = jax.lax.dot_general(
                    p_q, v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * jnp.float32(dsv / 127.0)
            else:
                pv = jax.lax.dot_general(
                    p_v.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        elif int8_p:
            # requantize P to int8 (cast_tile<PDataType> analog :452): p in
            # [0,1] maps to 0..127, PV rides the int8 MXU, descale_sv
            # (v_scale/127 — static) or 1/127 (dynamic, v_scale deferred to
            # the finish) on the int32 partial (:504). l sums the SAME
            # quantized p so the p-quant error cancels between numerator
            # and denominator at the finish divide.
            p_q = jnp.clip(
                jnp.round(jnp.exp(s - m_new[:, :1]) * 127.0), 0, 127
            ).astype(jnp.int8)
            l_add = jnp.sum(
                p_q.astype(jnp.float32), axis=-1, keepdims=True
            ) * jnp.float32(1.0 / 127.0)
            l_scr[...] = l_scr[...] * corr + l_add
            dsv = (static_quant[2] if static_quant is not None else 1.0)
            pv = jax.lax.dot_general(
                p_q, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * jnp.float32(dsv / 127.0)
        else:
            # serving fast path: exp lands directly in the compute dtype
            # (Mosaic fuses sub+exp+convert into one pass over s); l sums
            # the SAME bf16 p the PV dot consumes, so the p rounding
            # (~0.4%) hits numerator and denominator with equal weights
            # and largely cancels at the finish divide. (A row-sum via an
            # MXU ones-dot was measured SLOWER — 82 vs 104 TF: the VPU
            # reduction was already fused, the extra dot was pure cost.)
            p16 = jnp.exp(s - m_new[:, :1]).astype(v.dtype)  # [bq, bk]
            l_add = jnp.sum(p16.astype(jnp.float32), axis=-1, keepdims=True)
            l_scr[...] = l_scr[...] * corr + l_add
            pv = jax.lax.dot_general(
                p16, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc_scr[...] = acc_scr[...] * corr[:, :1] + pv

    # ---- interior-tile specialization -------------------------------------
    # A tile needs masking only if it touches the varlen tail, the causal
    # diagonal, or the window's trailing edge. Interior tiles (most of a
    # long causal prefill) skip the iota/compare/where chain — ~4 VPU
    # passes over [bq, bk] per tile on a VPU-bound kernel. CK analog:
    # MaskingSpecialization dispatch (mask disabled inside the full region,
    # block_masking.hpp IsEdgeTile).
    interior = jnp.bool_(not has_alibi) & (
        (kv_idx + 1) * bk <= lens_ref[0, batch]
    )
    if causal:
        interior &= (kv_idx * bk + bk - 1) <= (q_blk * bq + lens_ref[1, batch])
    if window is not None:
        interior &= kv_idx * bk > (q_blk * bq + bq - 1 + lens_ref[1, batch]) - window

    # ---- diagonal-tile sub-split (MEASURED NEGATIVE — off by default) -----
    # The block-aligned DIAGONAL tile of a causal sweep is half dead, and
    # at (1024,1024) blocks that waste is ~1.25x baked into the dots floor
    # (docs/performance.md round-3 roofline). This path splits the
    # exactly-aligned diagonal tile into a [bq, bk/2] lower-left dot plus
    # a [bq/2, bk/2] bottom-right dot — 0.75x the MXU and exp work, two
    # sequential online-softmax folds (associative over key chunks).
    # On-chip (round 5, 4k causal GQA 32/8): int8-KV 106.2 -> 96.5 TF-eff,
    # bf16 109.7 -> 99.3 — the 3-way pl.when dispatch plus the serialized
    # second fold cost more than the 25%-of-one-tile FLOP saving recovers,
    # the same verdict as every round-3 scheduling attempt. Config 4 is
    # hereby CLOSED at the (1024,1024) single-masked-path numbers; the
    # code stays behind CKT_DIAG_SPLIT=1 for re-probing on future Mosaic
    # versions. CK analog: masking_specialization.hpp:10-54 dispatch
    # pushed into the diagonal tile itself.
    import os

    diag_split = (
        os.environ.get("CKT_DIAG_SPLIT") == "1"
        and causal
        and window is None
        and bq == bk
        and bq >= 512
        and not has_bias
        and not has_alibi
        and dropout_rate == 0.0
        and static_quant is None
        and not mxu_int8
    )

    def _step_diag():
        h = bk // 2
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s_mul = scale
        if has_kv_scale:
            k = k.astype(q.dtype)
            v = v.astype(q.dtype)
            s_mul = scale * k_scale_ref[0, 0, 0]
        q = (q.astype(jnp.float32) * s_mul).astype(q.dtype)

        def fold(s, rows0, keys0, n_rows):
            # one online-softmax fold of s [n_rows, h] into scratch rows
            # [rows0, rows0+n_rows); keys start at tile-relative keys0
            r_rel = rows0 + jax.lax.broadcasted_iota(
                jnp.int32, (n_rows, h), 0
            )
            k_rel = keys0 + jax.lax.broadcasted_iota(
                jnp.int32, (n_rows, h), 1
            )
            k_pos = kv_idx * bk + k_rel
            mask = (k_rel <= r_rel) & (k_pos < lens_ref[0, batch])
            s = jnp.where(mask, s, _NEG_INF)
            rows = slice(rows0, rows0 + n_rows)
            m_prev = m_scr[rows, :]
            row_max = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, row_max)
            corr = jnp.exp(m_prev - m_new)
            m_scr[rows, :] = m_new
            p16 = jnp.exp(s - m_new[:, :1]).astype(v.dtype)
            l_add = jnp.sum(p16.astype(jnp.float32), axis=-1, keepdims=True)
            l_scr[rows, :] = l_scr[rows, :] * corr + l_add
            return p16, corr, rows

        # lower-left: all rows x first-half keys
        s_lo = jax.lax.dot_general(
            q, k[:h], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_lo, corr, rows = fold(s_lo, 0, 0, bq)
        acc_scr[...] = acc_scr[...] * corr[:, :1] + jax.lax.dot_general(
            p_lo, v[:h], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # bottom-right: only rows >= h can see keys >= h
        s_hi = jax.lax.dot_general(
            q[h:], k[h:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_hi, corr, rows = fold(s_hi, h, h, bq - h)
        acc_scr[rows, :] = acc_scr[rows, :] * corr[:, :1] + jax.lax.dot_general(
            p_hi, v[h:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if diag_split:
        # exactly-aligned diagonal: kv base == q base (+ traced offset)
        diag = (kv_idx * bk) == (q_blk * bq + lens_ref[1, batch])

        @pl.when(live & interior)
        def _step_plain():
            _step(False)

        @pl.when(live & jnp.logical_not(interior) & diag)
        def _step_diag_():
            _step_diag()

        @pl.when(live & jnp.logical_not(interior) & jnp.logical_not(diag))
        def _step_masked():
            _step(True)
    else:
        @pl.when(live & interior)
        def _step_plain():
            _step(False)

        @pl.when(live & jnp.logical_not(interior))
        def _step_masked():
            _step(True)

    @pl.when(kv_idx == n_k_steps - 1)
    def _finish():
        l = l_scr[...][:, :1]
        # fully-masked rows (tiny windows / zero-length KV): emit zeros
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o = acc_scr[...] / l_safe
        if has_kv_scale and static_quant is None:
            o = o * v_scale_ref[0, 0, 0]  # deferred per-head v scale
        o_ref[0] = o.astype(o_ref.dtype)
        if return_lse:
            m = m_scr[...]
            lse = jnp.where(
                l > 0.0, m + jnp.log(jnp.maximum(l_scr[...], 1e-30)), _NEG_INF
            )
            lse_ref[0] = lse.astype(lse_ref.dtype)


def flash_attention(
    q,
    k,
    v,
    *,
    scale: float | None = None,
    causal: bool = False,
    window: int | None = None,
    bias=None,
    alibi_slopes=None,
    kv_seq_len=None,
    causal_offset=None,
    k_scale=None,
    v_scale=None,
    static_quant_scales: tuple[float, float, float] | None = None,
    mxu_int8: bool = False,
    dropout_rate: float = 0.0,
    dropout_seed: int = 0,
    config: AttentionConfig | None = None,
    tune: bool = False,
    return_lse: bool = False,
    out_dtype=None,
    interpret: bool | None = None,
):
    """O = softmax(scale * Q K^T + bias + mask) V, never materializing S.

    q:          [B, Hq, Sq, D]
    k, v:       [B, Hkv, Sk, D] with Hq % Hkv == 0 (GQA/MQA); int8 allowed
                when ``k_scale``/``v_scale`` ([B, Hkv] f32) are given.
    static_quant_scales: (q_scale, k_scale, v_scale) per-tensor floats for
                the fully-quantized pipeline (CK fp8 static-quant analog,
                ``block_fmha_pipeline_qr_ks_vs_fp8.hpp``): q, k, v must all
                be int8 (x ≈ x_q · x_scale); both GEMMs run on the int8
                MXU (int32 acc), P is requantized to int8 between them.
                Output is bf16 unless ``out_dtype`` overrides.
    bias:       optional [B, Hq, Sq, Sk] additive attention bias.
    alibi_slopes: optional [Hq] f32 — in-kernel ALiBi: adds
                slope_h * (k_pos - q_pos) to the scores (q positions
                bottom-right aligned, matching the causal convention).
                2 flops/element in-VMEM instead of a materialized
                O(S^2 * H) bias tensor (block_position_encoding.hpp:47-88).
    kv_seq_len: optional [B] int32 — keys at positions >= len are masked
                (ragged batches; also how Sk padding is neutralized).
    causal_offset: optional [B] int32 (may be traced) — overrides the
                causal diagonal alignment per batch: query i attends keys
                <= i + causal_offset[b]. Used by ring attention, where the
                KV chunk's global position rotates each step.
    causal masking defaults to bottom-right alignment: query i attends
    keys <= Sk - Sq + i (decode convention, matching ``ref_attention``).
    Returns O [B, Hq, Sq, D] (and LSE [B, Hq, Sq] if ``return_lse``).
    """
    b, hq, sq, d = q.shape
    _, hkv, sk, dv = v.shape
    assert k.shape == (b, hkv, sk, d), (k.shape, (b, hkv, sk, d))
    assert hq % hkv == 0
    group = hq // hkv
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    static_quant = static_quant_scales
    if static_quant is not None:
        assert q.dtype == k.dtype == v.dtype == jnp.int8, (
            "static-quant pipeline takes int8 q/k/v",
            q.dtype, k.dtype, v.dtype,
        )
        assert k_scale is None and v_scale is None
        static_quant = tuple(float(s) for s in static_quant)
    if out_dtype is None:
        out_dtype = jnp.bfloat16 if static_quant is not None else q.dtype
    has_kv_scale = k_scale is not None
    if has_kv_scale:
        assert v_scale is not None and k_scale.shape == (b, hkv)
    compute_dtype = q.dtype

    if config is None and tune:
        # per-shape-class instance selection + persistent cache, mirroring
        # the GEMM tune=True path (CK: ckProfiler picks the fmha instance)
        from composable_kernel_tpu.tuning import autotune, registry

        kw = dict(
            scale=scale, causal=causal, window=window, bias=bias,
            kv_seq_len=kv_seq_len, causal_offset=causal_offset,
            k_scale=k_scale, v_scale=v_scale,
            static_quant_scales=static_quant_scales,
            dropout_rate=dropout_rate, dropout_seed=dropout_seed,
            out_dtype=out_dtype, interpret=interpret,
        )
        key = (f"b{b}_h{hq}.{hkv}_s{sq}x{sk}_d{d}_c{int(causal)}"
               f"_w{window or 0}_{jnp.dtype(q.dtype).name}")
        config, _ = autotune(
            "attention", key, registry.get_instances("attention"),
            lambda c: flash_attention(q, k, v, config=c, **kw),
            flops=4.0 * b * hq * sq * sk * d * (0.5 if causal else 1.0),
            chain_args=(
                lambda c: (
                    lambda q_, k_, v_: flash_attention(q_, k_, v_, config=c, **kw)
                ),
                (q, k, v),
            ),
        )
    cfg = config or AttentionConfig()
    # int8 tiles need 32-row sublane blocks (Mosaic min tile)
    q_sub = 32 if static_quant is not None else 16
    bq = min(
        _ceil_mult(sq, q_sub),
        max(q_sub, _ceil_mult(min(cfg.block_q, sq), q_sub)),
    )
    bk = min(_ceil_mult(sk, 128), max(128, _ceil_mult(min(cfg.block_k, sk), 128)))
    dp = _ceil_mult(d, _LANES)
    dvp = _ceil_mult(dv, _LANES)

    # flatten batch x heads; pad seq dims to block multiples, D to lanes
    q_p = pad_to(q.reshape(b * hq, sq, d), (None, bq, dp))
    k_p = pad_to(k.reshape(b * hkv, sk, d), (None, bk, dp))
    v_p = pad_to(v.reshape(b * hkv, sk, dv), (None, bk, dvp))
    sqp, skp = q_p.shape[1], k_p.shape[1]
    n_k_steps = skp // bk

    if kv_seq_len is None:
        lens = jnp.full((b,), sk, jnp.int32)
    else:
        lens = jnp.asarray(kv_seq_len, jnp.int32)
    if causal_offset is None:
        offs = jnp.full((b,), sk - sq, jnp.int32)  # bottom-right alignment
    else:
        offs = jnp.asarray(causal_offset, jnp.int32)
    lens2 = jnp.stack([lens, offs])  # [2, B] scalar-prefetch payload

    # index maps receive the scalar-prefetch ref as a trailing argument
    def q_index(bh, i, kk, *_):
        return (bh, i, 0)

    def kv_index(bh, i, kk, *scalars):
        # clamp the block index to the live KV prefix: blocks past
        # kv_seq_len re-read block 0 instead of streaming dead cache rows
        # from HBM (they are fully masked in-kernel, so only the DMA
        # traffic changes — decode caches are sized for max_seq but mostly
        # empty). scalars[0] is the [2, B] lens/offset payload.
        kk_live = kk
        if scalars:
            kk_live = indexing.clamped_block(kk, scalars[0][0, bh // hq], bk)
        return ((bh // hq) * hkv + (bh % hq) // group, kk_live, 0)

    in_specs = [
        pl.BlockSpec((1, bq, dp), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dp), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bk, dvp), kv_index, memory_space=pltpu.VMEM),
    ]
    inputs = [q_p, k_p, v_p]
    has_bias = bias is not None
    if has_bias:
        bias_p = pad_to(
            jnp.asarray(bias).reshape(b * hq, sq, sk), (None, bq, bk)
        )
        in_specs.append(
            pl.BlockSpec((1, bq, bk), lambda bh, i, kk, *_: (bh, i, kk), memory_space=pltpu.VMEM)
        )
        inputs.append(bias_p)
    has_alibi = alibi_slopes is not None
    if has_alibi:
        # per-head slope as an SMEM scalar; the index map picks the head.
        # bias = slope * (k_pos - q_pos) computed in-kernel (CK
        # block_position_encoding.hpp:47-88) — no O(S^2 * H) bias tensor.
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(hq, 1, 1)
        assert slopes.shape[0] == hq, (slopes.shape, hq)
        in_specs.append(
            pl.BlockSpec(
                (1, 1, 1), lambda bh, i, kk, *_: (bh % hq, 0, 0),
                memory_space=pltpu.SMEM,
            )
        )
        inputs.append(slopes)
    if has_kv_scale:
        ks = jnp.asarray(k_scale, jnp.float32).reshape(b * hkv, 1, 1)
        vs = jnp.asarray(v_scale, jnp.float32).reshape(b * hkv, 1, 1)
        sc_spec = pl.BlockSpec(
            (1, 1, 1),
            lambda bh, i, kk, *_: ((bh // hq) * hkv + (bh % hq) // group, 0, 0),
            memory_space=pltpu.SMEM,
        )
        in_specs += [sc_spec, sc_spec]
        inputs += [ks, vs]

    out_shapes = [jax.ShapeDtypeStruct((b * hq, sqp, dvp), out_dtype)]
    out_specs = [pl.BlockSpec((1, bq, dvp), q_index, memory_space=pltpu.VMEM)]
    if return_lse:
        out_shapes.append(jax.ShapeDtypeStruct((b * hq, sqp, _LANES), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, bq, _LANES), q_index, memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _fa_kernel,
        has_bias=has_bias,
        has_alibi=has_alibi,
        has_kv_scale=has_kv_scale,
        return_lse=return_lse,
        scale=scale,
        causal=causal,
        window=window,
        dropout_rate=dropout_rate,
        dropout_seed=dropout_seed,
        interpret_mode=interpret,
        n_k_steps=n_k_steps,
        bq=bq,
        bk=bk,
        heads_q=hq,
        static_quant=static_quant,
        mxu_int8=mxu_int8,
    )

    flops = 4 * b * hq * sq * sk * (d + dv) // 2
    bytes_accessed = int(
        q_p.size * q_p.dtype.itemsize
        + k_p.size * k_p.dtype.itemsize
        + v_p.size * v_p.dtype.itemsize
        + b * hq * sqp * dvp * jnp.dtype(out_dtype).itemsize
    )

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * hq, sqp // bq, n_k_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((bq, _LANES), jnp.float32),  # running max
                pltpu.VMEM((bq, _LANES), jnp.float32),  # running sum
                pltpu.VMEM((bq, dvp), jnp.float32),  # O accumulator
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(
                cfg.vmem_limit_mb * 1024 * 1024 if cfg.vmem_limit_mb else None
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed,
            transcendentals=b * hq * sq * sk,
        ),
        interpret=interpret,
    )(lens2, *inputs)

    o = outs[0][:, :sq, :dv].reshape(b, hq, sq, dv)
    if return_lse:
        lse = outs[1][:, :sq, 0].reshape(b, hq, sq)
        return o, lse
    return o


def flash_decode(
    q,
    k,
    v,
    *,
    kv_seq_len=None,
    num_splits: int = 1,
    scale: float | None = None,
    k_scale=None,
    v_scale=None,
    k_new=None,
    v_new=None,
    window: int | None = None,
    config: AttentionConfig | None = None,
    out_dtype=None,
    interpret: bool | None = None,
):
    """Split-KV flash-decoding for short-Q / long-KV (decode) shapes.

    CK analog: fmha_fwd_splitkv_kernel.hpp + fmha_fwd_splitkv_combine_kernel
    (:76-141 — partial O and LSE per split, then a log-sum-exp combine).
    The KV sequence is partitioned into ``num_splits`` chunks processed as
    independent attention problems (extra parallelism when B*H is small);
    the combine is a tiny jnp log-sum-exp reduction that XLA fuses.

    num_splits matters on multi-core parts; on a single-tensorcore chip
    (v5e) the grid is sequential anyway and the split's KV reshuffle is
    pure overhead, so the default is 1.

    q: [B, Hq, Sq, D] (Sq small); k, v: [B, Hkv, Sk, D].
    """
    b, hq, sq, d = q.shape
    _, hkv, sk, dv = v.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if kv_seq_len is None:
        kv_seq_len = jnp.full((b,), sk, jnp.int32)
    cfg = config or AttentionConfig()
    num_splits = max(1, min(num_splits, -(-sk // max(cfg.block_k, 128))))
    if num_splits == 1 or sk % num_splits != 0:
        # head-grouped single-stream kernel: each KV block DMA'd once for
        # ALL query heads (the [B*Hq, ...] flash grid re-fetches per head —
        # measured 3.6x slower at GQA 32/8 decode shapes)
        from composable_kernel_tpu.ops.attention.paged import decode_attention

        return decode_attention(
            q, k, v, kv_seq_len=kv_seq_len, k_scale=k_scale, v_scale=v_scale,
            k_new=k_new, v_new=v_new,
            window=window, block_k=max(cfg.block_k, 512), scale=scale,
            out_dtype=out_dtype, interpret=interpret,
        )

    assert k_new is None, "deferred fresh-token append uses the unsplit path"
    assert window is None, "sliding-window decode uses the unsplit path"
    chunk = sk // num_splits
    # [B, Hkv, S, D] -> [B*splits, Hkv, chunk, D]: fold splits into batch
    ks = k.reshape(b, hkv, num_splits, chunk, d).transpose(0, 2, 1, 3, 4)
    ks = ks.reshape(b * num_splits, hkv, chunk, d)
    vs = v.reshape(b, hkv, num_splits, chunk, dv).transpose(0, 2, 1, 3, 4)
    vs = vs.reshape(b * num_splits, hkv, chunk, dv)
    qs = jnp.broadcast_to(q[:, None], (b, num_splits, hq, sq, d))
    qs = qs.reshape(b * num_splits, hq, sq, d)
    # per-split kv lengths: split i covers [i*chunk, (i+1)*chunk)
    starts = jnp.arange(num_splits, dtype=jnp.int32)[None, :] * chunk
    lens = jnp.clip(kv_seq_len[:, None] - starts, 0, chunk).reshape(-1)
    sc = lambda s: (
        None if s is None
        else jnp.broadcast_to(s[:, None], (b, num_splits, hkv)).reshape(-1, hkv)
    )

    o, lse = flash_attention(
        qs, ks, vs, scale=scale, causal=False, kv_seq_len=lens,
        k_scale=sc(k_scale), v_scale=sc(v_scale), config=cfg,
        return_lse=True, out_dtype=jnp.float32, interpret=interpret,
    )
    o = o.reshape(b, num_splits, hq, sq, dv)
    lse = lse.reshape(b, num_splits, hq, sq)

    # log-sum-exp combine over splits (the "combine kernel")
    m = jnp.max(lse, axis=1, keepdims=True)
    m = jnp.where(m > _NEG_INF / 2, m, 0.0)
    w = jnp.exp(lse - m)
    denom = jnp.sum(w, axis=1, keepdims=True)
    o = jnp.sum(o * w[..., None], axis=1) / jnp.maximum(denom[..., None], 1e-30)[:, 0]
    return o.astype(out_dtype or q.dtype)
