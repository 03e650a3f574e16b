"""Reference attention (batched_gemm_scale_softmax_gemm).

Mirrors CK's fused-attention math (documented at
``docs/reference/Supported_Primitives_Guide.rst:14-82`` and implemented in
``gridwise_batched_gemm_softmax_gemm_xdl_cshuffle_v1.hpp:699-925``):
O = softmax(scale * Q K^T + bias [+ mask]) V, with CK's
``MaskingSpecialization`` modes (masking_specialization.hpp:10-54) extended
with sliding-window (ck_tile block_masking.hpp) and GQA/MQA head mapping
(device_multi_query_attention_forward_wmma.hpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def _mask_bias(s_len_q, s_len_k, causal: bool, window: int | None, q_offset: int):
    """Additive -inf mask [Sq, Sk]. ``q_offset`` aligns causal diag for decode.

    causal=True reproduces CK MaskOutUpperTriangle; window w keeps keys in
    (q_pos - w, q_pos] (sliding-window attention, ck_tile block_masking.hpp).
    """
    q_pos = np.arange(s_len_q)[:, None] + q_offset
    k_pos = np.arange(s_len_k)[None, :]
    allowed = np.ones((s_len_q, s_len_k), bool)
    if causal:
        allowed &= k_pos <= q_pos
    if window is not None:
        allowed &= k_pos > q_pos - window
    return jnp.where(jnp.asarray(allowed), 0.0, -jnp.inf).astype(jnp.float32)


def ref_gemm_softmax_gemm(q, k, v, scale=None, causal=False, bias=None):
    """Single-head reference: O = softmax(scale·QKᵀ [+bias]) V.

    q: [Sq, D], k: [Sk, D], v: [Sk, Dv].
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    s = scale * jnp.matmul(
        q.astype(jnp.float32), k.astype(jnp.float32).T,
        preferred_element_type=jnp.float32, precision=_HI,
    )
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    s = s + _mask_bias(q.shape[0], k.shape[0], causal, None, k.shape[0] - q.shape[0])
    p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    return jnp.matmul(p, v.astype(jnp.float32), preferred_element_type=jnp.float32, precision=_HI)


def ref_attention(
    q,
    k,
    v,
    scale=None,
    causal: bool = False,
    window: int | None = None,
    bias=None,
    kv_seq_len=None,
    q_offset=None,
    out_dtype=None,
):
    """Multi-head reference attention with GQA.

    q: [B, Hq, Sq, D]; k, v: [B, Hkv, Sk, D] with Hq % Hkv == 0.
    ``kv_seq_len``: optional [B] int array — keys at positions >= kv_seq_len[b]
    are masked out (ragged/varlen batches, ck_tile "group mode" analog).
    ``bias``: optional [B, Hq, Sq, Sk] additive bias (CK's C0 bias / alibi).
    The causal diagonal is aligned bottom-right (decode convention,
    ck_tile mask "bottom-right" mode): query i attends keys <= Sk - Sq + i;
    ``q_offset`` ([B] or scalar) overrides that alignment (decode over a
    partially-filled cache: q_offset = live_len - Sq).
    """
    b_sz, hq, sq, d = q.shape
    _, hkv, sk, _ = k.shape
    assert hq % hkv == 0
    rep = hq // hkv
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    kf = jnp.repeat(k.astype(jnp.float32), rep, axis=1)
    vf = jnp.repeat(v.astype(jnp.float32), rep, axis=1)
    s = scale * jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kf, precision=_HI)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if q_offset is None:
        s = s + _mask_bias(sq, sk, causal, window, sk - sq)[None, None]
    else:
        off = jnp.broadcast_to(jnp.asarray(q_offset, jnp.int32), (b_sz,))
        q_pos = jnp.arange(sq)[None, :, None] + off[:, None, None]
        k_pos = jnp.arange(sk)[None, None, :]
        allowed = jnp.ones((b_sz, sq, sk), bool)
        if causal:
            allowed &= k_pos <= q_pos
        if window is not None:
            allowed &= k_pos > q_pos - window
        s = s + jnp.where(allowed, 0.0, -jnp.inf)[:, None]
    if kv_seq_len is not None:
        kpos = jnp.arange(sk)[None, None, None, :]
        s = jnp.where(kpos < kv_seq_len[:, None, None, None], s, -jnp.inf)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    # rows that are fully masked (can happen with tiny windows) -> zeros
    s_max = jnp.where(jnp.isfinite(s_max), s_max, 0.0)
    p = jnp.exp(s - s_max)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(denom, 1e-30)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, vf, precision=_HI)
    return out.astype(out_dtype or q.dtype)


def ref_quantize_per_tensor(x, bits: int = 8):
    """Symmetric per-tensor int8 quantization: returns (x_q int8, scale).

    The static-quant calibration step of CK's fp8 fmha pipeline (per-tensor
    ranges, example/ck_tile/01_fmha README squant/range_* flags), with int8
    as the v5e-native quantized dtype.
    """
    qmax = 2 ** (bits - 1) - 1
    scale = float(jnp.max(jnp.abs(x.astype(jnp.float32)))) / qmax
    scale = max(scale, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -qmax, qmax)
    return xq.astype(jnp.int8), scale


def ref_quant_attention(
    q_q, k_q, v_q, q_scale, k_scale, v_scale,
    scale=None, causal=False, window=None, kv_seq_len=None, out_dtype=None,
):
    """Structural reference for the static-quant pipeline: same quantized
    GEMM domains and P-requantization as the kernel (int32 QK^T, descale
    folded into the softmax scale, P -> int8 0..127, int32 PV, descale_sv)
    so comparisons are tight rather than bounded by quantization error.

    CK analog: block_fmha_pipeline_qr_ks_vs_fp8.hpp:241,316,452,504.
    """
    b_sz, hq, sq, d = q_q.shape
    _, hkv, sk, _ = k_q.shape
    rep = hq // hkv
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    ki = jnp.repeat(k_q.astype(jnp.int32), rep, axis=1)
    vi = jnp.repeat(v_q.astype(jnp.int32), rep, axis=1)
    s_i = jnp.einsum("bhqd,bhkd->bhqk", q_q.astype(jnp.int32), ki)
    s = s_i.astype(jnp.float32) * (scale * q_scale * k_scale)
    s = s + _mask_bias(sq, sk, causal, window, sk - sq)[None, None]
    if kv_seq_len is not None:
        kpos = jnp.arange(sk)[None, None, None, :]
        s = jnp.where(kpos < kv_seq_len[:, None, None, None], s, -jnp.inf)
    s_max = jnp.max(s, axis=-1, keepdims=True)
    s_max = jnp.where(jnp.isfinite(s_max), s_max, 0.0)
    p = jnp.exp(s - s_max)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    p_q = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int32)
    pv = jnp.einsum("bhqk,bhkd->bhqd", p_q, vi).astype(jnp.float32)
    out = pv * (v_scale / 127.0) / denom
    return out.astype(out_dtype or jnp.bfloat16)


def ref_attention_varlen_cache(
    q, cache_k, cache_v, starts, lens, kv_lens, *,
    k_scale=None, v_scale=None, window=None, scale=None,
):
    """Reference for packed chunk queries against per-slot KV caches
    (``ops.attention.flash_attention_varlen_cache``): sequence w's rows
    ``q[starts[w] : starts[w]+lens[w]]`` attend cache slot w rows
    ``[0, kv_lens[w])`` with bottom-right causal alignment (chunk row i at
    key position kv_lens[w]-lens[w]+i). starts/lens/kv_lens host-static.
    """
    starts = np.asarray(starts)
    lens = np.asarray(lens)
    kv_lens = np.asarray(kv_lens)
    out = jnp.zeros(q.shape, jnp.float32)
    for w, (s0, li, kl) in enumerate(zip(starts, lens, kv_lens)):
        s0, li, kl = int(s0), int(li), int(kl)
        if li == 0:
            continue
        kf = cache_k[w, :, :kl].astype(jnp.float32)
        vf = cache_v[w, :, :kl].astype(jnp.float32)
        if k_scale is not None:
            kf = kf * k_scale[w][:, None, None]
            vf = vf * v_scale[w][:, None, None]
        o = ref_attention(
            q[s0 : s0 + li].transpose(1, 0, 2)[None],
            kf[None], vf[None],
            causal=True, window=window, scale=scale, out_dtype=jnp.float32,
        )[0].transpose(1, 0, 2)
        out = out.at[s0 : s0 + li].set(o)
    return out.astype(q.dtype)


def ref_attention_varlen(q, k, v, starts, lens, *, window=None, scale=None):
    """Packed group-mode reference: per-sequence causal attention over
    block-aligned packed [T, H, D] buffers (ops.attention.varlen layout,
    ck_tile group mode fmha_fwd_kernel.hpp:505-555). starts/lens must be
    host-static. Pad rows pass through as zeros.
    """
    starts = np.asarray(starts)
    lens = np.asarray(lens)
    out = jnp.zeros(q.shape, jnp.float32)
    for s0, li in zip(starts, lens):
        s0, li = int(s0), int(li)
        o = ref_attention(
            q[s0 : s0 + li].transpose(1, 0, 2)[None],
            k[s0 : s0 + li].transpose(1, 0, 2)[None],
            v[s0 : s0 + li].transpose(1, 0, 2)[None],
            causal=True, window=window, scale=scale,
            out_dtype=jnp.float32,
        )[0].transpose(1, 0, 2)
        out = out.at[s0 : s0 + li].set(o)
    return out.astype(q.dtype)
