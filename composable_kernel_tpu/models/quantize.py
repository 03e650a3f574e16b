"""GPTQ: calibration-based error-compensating weight quantization.

The reference quantizes with plain round-to-nearest at the copy stage
(``type_convert`` RTN, ``element/unary_element_wise_operation.hpp:236-287``)
and leaves accuracy to the caller; the BASELINE.json gate (W4A16 ppl within
0.1 of full precision) makes quantization *quality* a framework feature
here. This implements GPTQ (Frantar et al., 2022 — public algorithm):
layer-sequential second-order error compensation. For each linear W [K, N]
with calibration inputs X [T, K]:

  H = X^T X + damp*I;  U = chol(H^-1) upper
  for input-dim k in order:
      quantize W[k, :] against its group scale
      W[k+1:, :] -= outer(U[k, k+1:], (W[k] - deq(W[k])) / U[k, k])

so later rows absorb the rounding error of earlier ones, weighted by input
correlations. Activations propagate through the already-quantized layers
(standard GPTQ sequencing), all in f64/f32 host math.

Output format is identical to ``llama.quantize_weights`` (same packed int4
split-halves + group scales), so the result drops into every kernel path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.models import llama
from composable_kernel_tpu.reference.attention import ref_attention

__all__ = [
    "awq_quantize_llama",
    "awq_search_scale",
    "gptq_matrix",
    "gptq_quantize_gpt2",
    "gptq_quantize_llama",
    "smoothquant_quantize_llama",
    "smoothquant_search_scale",
]


def gptq_matrix(w, h, *, group_size=None, bits=4, percdamp=0.01,
                block: int = 128):
    """GPTQ-quantize one weight W [K, N] given Hessian H = X^T X [K, K].

    group_size=None -> per-channel (one scale per output column, int8
    path); else group-wise along K (w4a16 layout). Returns
    (w_q int8 values, scales f32 [K/g, N] or [N]).

    Blocked (lazy-batch) formulation: rank-1 error updates stay inside a
    ``block``-row panel; the trailing rows get ONE GEMM per panel
    (U_panel^T @ E). Mathematically identical to the row-by-row loop but
    BLAS-3 — the difference between minutes and hours per matrix at
    Llama-8B K=14336.
    """
    w = np.asarray(w, np.float64).copy()
    h = np.asarray(h, np.float64).copy()
    k_dim, n = w.shape
    g = group_size or k_dim
    assert k_dim % g == 0
    # grouped scales read w[k:k+g] at the group start, so a panel must
    # cover the whole group (rows outside the panel would lag the in-panel
    # corrections and the scale would differ from the row-by-row loop)
    block = g if group_size else block
    qmax = 2 ** (bits - 1) - 1

    diag = np.arange(k_dim)
    dead = h[diag, diag] == 0
    h[diag[dead], diag[dead]] = 1.0
    w[dead, :] = 0.0
    h[diag, diag] += percdamp * np.mean(h[diag, diag])
    u = np.linalg.cholesky(np.linalg.inv(h)).T  # upper: Hinv = U^T U

    w_q = np.zeros((k_dim, n), np.int8)
    scales = np.zeros((k_dim // g, n), np.float32)
    for lo in range(0, k_dim, block):
        hi = min(lo + block, k_dim)
        errs = np.zeros((hi - lo, n))
        for k in range(lo, hi):
            gi = k // g
            if k % g == 0:
                absmax = np.abs(w[k : k + g, :]).max(axis=0)
                scales[gi] = np.maximum(absmax / qmax, 1e-8)
            s = scales[gi]
            q = np.clip(np.round(w[k] / s), -qmax - 1, qmax)
            w_q[k] = q.astype(np.int8)
            err = (w[k] - q * s) / u[k, k]
            errs[k - lo] = err
            if k + 1 < hi:
                # in-panel rows update immediately (their quantization
                # depends on these corrections)
                w[k + 1 : hi, :] -= np.outer(u[k, k + 1 : hi], err)
        if hi < k_dim:
            # one GEMM folds the whole panel's error into the trailing rows
            w[hi:, :] -= u[lo:hi, hi:].T @ errs
    if group_size is None:
        return w_q, scales[0]
    return w_q, scales


def _hessian(x):
    """H = X^T X in f64 for calibration inputs X [T, K]."""
    xf = np.asarray(x, np.float64)
    return xf.T @ xf


class _Quantizer:
    def __init__(self, cfg: llama.LlamaConfig, percdamp: float):
        # w4a8 shares w4a16's weight quantization (GPTQ calibrates weights
        # against full-precision activations; the per-token int8 activation
        # quant is a runtime step) — only the pack layout differs.
        assert cfg.quant in ("w4a16", "w4a8", "int8", "w8a8"), cfg.quant
        self.cfg = cfg
        self.percdamp = percdamp

    def __call__(self, w, x, row_parallel=False):
        """Quantize W [K, N] with inputs x [T, K]; returns the param leaf
        and the dequantized f32 weight (for propagating activations)."""
        cfg = self.cfg
        h = _hessian(x)
        if cfg.quant in ("int8", "w8a8"):
            w_q, s = gptq_matrix(w, h, group_size=None, bits=8,
                                 percdamp=self.percdamp)
            deq = w_q.astype(np.float32) * s[None, :]
            return {"q": jnp.asarray(w_q), "s": jnp.asarray(s)}, deq
        w_q, s = gptq_matrix(w, h, group_size=cfg.group_size, bits=4,
                             percdamp=self.percdamp)
        deq = w_q.astype(np.float32) * np.repeat(s, cfg.group_size, axis=0)
        blocks = cfg.tp_pack if row_parallel else 1
        pack = dtypes.pack_int4 if cfg.quant == "w4a16" else dtypes.pack_int4_w4a8
        packed = pack(jnp.asarray(w_q), axis=0, blocks=blocks)
        return {"q": packed, "s": jnp.asarray(s)}, deq


# --------------------------------------------------------------- AWQ ------
#
# Activation-aware weight quantization (Lin et al., 2023 — public
# algorithm): scale each input channel k of W by s[k] before quantizing and
# divide the activation by s[k], chosen so channels with large activations
# (the "salient" ones) get finer effective quantization grids. The division
# is FOLDED into the producing op (norm gamma or the previous linear's
# output columns) so runtime cost is zero and full-precision function is
# unchanged. Composes with GPTQ: the scaled weight is GPTQ-quantized
# against the scaled Hessian.


def awq_search_scale(w, x, *, group_size, bits=4, n_grid=20):
    """Grid-search the AWQ channel scales for W [K, N] with inputs x [T, K].

    s[k] = mean|x[:, k]|^alpha, alpha in [0, 1); picks the alpha minimizing
    ||x @ W - (x / s) @ quant(W * s)||^2 on the calibration batch.
    Returns (s [K] f64, best_alpha).
    """
    w = np.asarray(w, np.float64)
    x = np.asarray(x, np.float64)
    k_dim, n = w.shape
    g = group_size or k_dim
    qmax = 2 ** (bits - 1) - 1
    absmean = np.abs(x).mean(axis=0) + 1e-8
    absmean = absmean / np.exp(np.log(absmean).mean())  # geomean-normalized
    ref = x @ w

    def quant_err(s):
        ws = w * s[:, None]
        wg = ws.reshape(k_dim // g, g, n)
        sc = np.maximum(np.abs(wg).max(axis=1) / qmax, 1e-8)
        q = np.clip(np.round(wg / sc[:, None, :]), -qmax - 1, qmax)
        deq = (q * sc[:, None, :]).reshape(k_dim, n)
        return float(np.sum((ref - (x / s[None, :]) @ deq) ** 2))

    best_s, best_err, best_alpha = np.ones(k_dim), quant_err(np.ones(k_dim)), 0.0
    for i in range(1, n_grid):
        alpha = i / n_grid
        s = absmean ** alpha
        e = quant_err(s)
        if e < best_err:
            best_s, best_err, best_alpha = s, e, alpha
    return best_s, best_alpha


def smoothquant_search_scale(w, x, *, n_grid=20):
    """SmoothQuant channel scales for W8A8 (Xiao et al., 2022 — public
    algorithm): s[k] = amax_x[k]^alpha / amax_w[k]^(1-alpha), migrating
    activation-outlier difficulty into the (easier) per-channel weight
    quantization. Unlike ``awq_search_scale``, the error model quantizes
    BOTH sides — per-token int8 activations and per-channel int8 weights —
    because the W8A8 kernel does (``ops/quant/w4a8.py::w8a8_gemm``).
    Returns (s [K] f64, best_alpha or None if identity won).
    """
    w = np.asarray(w, np.float64)
    x = np.asarray(x, np.float64)
    k_dim, _ = w.shape
    a_max = np.abs(x).max(axis=0) + 1e-8
    w_max = np.abs(w).max(axis=1) + 1e-8
    ref = x @ w

    def sq_err(s):
        xs = x / s[None, :]
        a_s = np.maximum(np.abs(xs).max(axis=1, keepdims=True) / 127.0, 1e-12)
        x_q = np.round(np.clip(xs / a_s, -127, 127))
        ws = w * s[:, None]
        w_sc = np.maximum(np.abs(ws).max(axis=0) / 127.0, 1e-12)
        w_q = np.round(np.clip(ws / w_sc[None, :], -127, 127))
        approx = (x_q @ w_q) * w_sc[None, :] * a_s
        return float(np.sum((ref - approx) ** 2))

    best_s, best_err, best_alpha = np.ones(k_dim), sq_err(np.ones(k_dim)), None
    for i in range(n_grid):
        alpha = i / n_grid
        s = a_max ** alpha / w_max ** (1.0 - alpha)
        s = s / np.exp(np.log(s).mean())  # geomean-normalized fold
        e = sq_err(s)
        if e < best_err:
            best_s, best_err, best_alpha = s, e, alpha
    return best_s, best_alpha


def _gqa_group_scale(s, n_kv, rep, hd):
    """Constrain per-channel o-proj scales to be shared across each GQA
    head group (o input channel (h, d) maps to v channel (h // rep, d), so
    a v-column fold must use one scale per (kv-head, d)). Geomean within
    the group keeps the search's relative weighting."""
    s = np.asarray(s, np.float64).reshape(n_kv * rep, hd)
    sg = np.exp(np.log(s).reshape(n_kv, rep, hd).mean(axis=1))
    return np.repeat(sg, rep, axis=0).reshape(-1), sg.reshape(-1)


def awq_quantize_llama(params, cfg_q: llama.LlamaConfig, calib_tokens, *,
                       n_grid=20, use_gptq=True, percdamp: float = 0.01,
                       quant_lm_head: bool = True):
    """AWQ scale search + fold, then (optionally GPTQ-) quantize.

    Folds (exact in full precision — the model function is unchanged):
      - qkv input scale       -> attn_norm gamma /= s
      - gate/up input scale   -> ffn_norm gamma /= s
      - o-proj input scale    -> wv output columns /= s (GQA-group shared;
                                 attention is linear in V so this is exact)
      - down-proj input scale -> w_up output columns /= s (silu(g) * (u/s))
      - lm_head input scale   -> final norm gamma /= s

    Returns a tree interchangeable with ``llama.quantize_weights`` output.
    Unfused layouts only (fuse_qkv folds share the same input scale and
    would be straightforward, but the serving fuse happens post-quant).
    """
    cfg = cfg_q
    assert cfg.quant in ("w4a16", "w4a8"), cfg.quant
    assert not cfg.fuse_qkv, "run AWQ on the unfused tree, fuse after"
    assert not cfg.qkv_bias, (
        "qkv-bias models: the o-proj fold would also rescale bv; "
        "calibration folds for biased trees are unimplemented"
    )
    bits = 4
    quant = _Quantizer(cfg, percdamp)
    toks = jnp.asarray(calib_tokens, jnp.int32)
    b, s_len = toks.shape
    hd = cfg.head_dim
    rep = cfg.n_heads // cfg.n_kv_heads

    x = jnp.take(params["embed"], toks, axis=0).astype(jnp.float32)
    cos, sin = llama.rope_cos_sin(jnp.arange(s_len), hd, cfg.rope_theta)

    def q_one(w64, x_np, row_parallel=False):
        """Quantize already-scaled W against already-scaled inputs."""
        if use_gptq:
            return quant(w64.astype(np.float32), x_np,
                         row_parallel=row_parallel)
        w_q, sc = gptq_matrix(w64, np.eye(w64.shape[0]),
                              group_size=cfg.group_size, bits=bits,
                              percdamp=0.0)  # identity H = plain RTN
        deq = w_q.astype(np.float32) * np.repeat(sc, cfg.group_size, axis=0)
        blocks = cfg.tp_pack if row_parallel else 1
        pack = dtypes.pack_int4 if cfg.quant == "w4a16" else dtypes.pack_int4_w4a8
        return {"q": pack(jnp.asarray(w_q), axis=0, blocks=blocks),
                "s": jnp.asarray(sc)}, deq

    new_layers = []
    for layer in params["layers"]:
        new_l = {}
        h1 = _rms(x, layer["attn_norm"], cfg.norm_eps)
        x1 = np.asarray(h1.reshape(b * s_len, -1))

        # --- qkv shared input scale -> attn_norm gamma ------------------
        w_cat = np.concatenate(
            [np.asarray(layer[nm], np.float64) for nm in ("wq", "wk", "wv")],
            axis=1,
        )
        s_qkv, _ = awq_search_scale(w_cat, x1, group_size=cfg.group_size,
                                    bits=bits, n_grid=n_grid)
        new_l["attn_norm"] = jnp.asarray(
            np.asarray(layer["attn_norm"], np.float64) / s_qkv,
            np.asarray(layer["attn_norm"]).dtype,
        )
        x1s = x1 / s_qkv[None, :]
        deq = {}
        wv_scaled = None
        for nm in ("wq", "wk", "wv"):
            w64 = np.asarray(layer[nm], np.float64) * s_qkv[:, None]
            if nm == "wv":
                wv_scaled = w64  # o-proj fold lands on these columns
                continue
            new_l[nm], deq[nm] = q_one(w64, x1s)

        # forward q/k with quantized weights, v in fp for now (needed to
        # search the o-proj scale before wv is finalized)
        qh = jnp.asarray(x1s @ deq["wq"], jnp.float32).reshape(b, s_len, -1, hd)
        kh = jnp.asarray(x1s @ deq["wk"], jnp.float32).reshape(b, s_len, -1, hd)
        vh = jnp.asarray(x1s @ wv_scaled, jnp.float32).reshape(b, s_len, -1, hd)
        qh = llama.apply_rope(qh.transpose(0, 2, 1, 3), cos, sin)
        kh = llama.apply_rope(kh.transpose(0, 2, 1, 3), cos, sin)
        o = ref_attention(qh, kh, vh.transpose(0, 2, 1, 3), causal=True,
                          out_dtype=jnp.float32)
        o2 = np.asarray(o.transpose(0, 2, 1, 3).reshape(b * s_len, -1),
                        np.float64)

        # --- o-proj input scale -> wv output columns (GQA-shared) -------
        s_o_raw, _ = awq_search_scale(
            np.asarray(layer["wo"], np.float64), o2,
            group_size=cfg.group_size, bits=bits, n_grid=n_grid,
        )
        s_o, s_o_kv = _gqa_group_scale(s_o_raw, cfg.n_kv_heads, rep, hd)
        new_l["wv"], deq_wv = q_one(wv_scaled / s_o_kv[None, :], x1s)
        o2s = o2 / s_o[None, :]
        new_l["wo"], deq_wo = q_one(
            np.asarray(layer["wo"], np.float64) * s_o[:, None], o2s,
            row_parallel=True,
        )
        # recompute o with the final quantized v for propagation
        vh_q = jnp.asarray(x1s @ deq_wv, jnp.float32).reshape(b, s_len, -1, hd)
        o_q = ref_attention(qh, kh, vh_q.transpose(0, 2, 1, 3), causal=True,
                            out_dtype=jnp.float32)
        o2_q = np.asarray(
            o_q.transpose(0, 2, 1, 3).reshape(b * s_len, -1), np.float64
        )
        x = x + jnp.asarray(o2_q @ deq_wo, jnp.float32).reshape(b, s_len, -1)

        # --- gate/up shared input scale -> ffn_norm gamma ---------------
        h2 = _rms(x, layer["ffn_norm"], cfg.norm_eps)
        x2 = np.asarray(h2.reshape(b * s_len, -1), np.float64)
        gu_cat = np.concatenate(
            [np.asarray(layer["w_gate"], np.float64),
             np.asarray(layer["w_up"], np.float64)], axis=1,
        )
        s_gu, _ = awq_search_scale(gu_cat, x2, group_size=cfg.group_size,
                                   bits=bits, n_grid=n_grid)
        new_l["ffn_norm"] = jnp.asarray(
            np.asarray(layer["ffn_norm"], np.float64) / s_gu,
            np.asarray(layer["ffn_norm"]).dtype,
        )
        x2s = x2 / s_gu[None, :]
        new_l["w_gate"], deq_g = q_one(
            np.asarray(layer["w_gate"], np.float64) * s_gu[:, None], x2s
        )
        up_scaled = np.asarray(layer["w_up"], np.float64) * s_gu[:, None]

        gg = x2s @ deq_g
        uu_fp = x2s @ up_scaled
        hmid_fp = np.asarray(jax.nn.silu(jnp.asarray(gg, jnp.float32)),
                             np.float64) * uu_fp

        # --- down-proj input scale -> w_up output columns ---------------
        s_d, _ = awq_search_scale(
            np.asarray(layer["w_down"], np.float64), hmid_fp,
            group_size=cfg.group_size, bits=bits, n_grid=n_grid,
        )
        new_l["w_up"], deq_u = q_one(up_scaled / s_d[None, :], x2s)
        hmid = np.asarray(jax.nn.silu(jnp.asarray(gg, jnp.float32)),
                          np.float64) * (x2s @ deq_u)
        new_l["w_down"], deq_d = q_one(
            np.asarray(layer["w_down"], np.float64) * s_d[:, None], hmid,
            row_parallel=True,
        )
        x = x + jnp.asarray(hmid @ deq_d, jnp.float32).reshape(b, s_len, -1)
        new_layers.append(new_l)

    out = dict(params)
    out["layers"] = new_layers
    if quant_lm_head:
        w_lm = np.asarray(params["lm_head"], np.float64)
        hf = _rms(x, params["norm"], cfg.norm_eps)
        xf = np.asarray(hf.reshape(b * s_len, -1), np.float64)
        s_lm, _ = awq_search_scale(w_lm, xf, group_size=cfg.group_size,
                                   bits=bits, n_grid=n_grid)
        out["norm"] = jnp.asarray(
            np.asarray(params["norm"], np.float64) / s_lm,
            np.asarray(params["norm"]).dtype,
        )
        out["lm_head"], _ = q_one(w_lm * s_lm[:, None], xf / s_lm[None, :])
    return out


def _rms(x, gamma, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(ms + eps) * gamma.astype(jnp.float32)


def smoothquant_quantize_llama(params, cfg_q: llama.LlamaConfig,
                               calib_tokens, *, n_grid=20,
                               quant_lm_head: bool = True):
    """SmoothQuant calibration for the W8A8 path: per-site alpha search
    (``smoothquant_search_scale``) + the exact fold set of
    ``awq_quantize_llama`` (qkv -> attn_norm, o -> wv columns GQA-shared,
    gate/up -> ffn_norm, down -> w_up columns, lm_head -> final norm), then
    per-channel int8 RTN. Output tree is interchangeable with
    ``llama.quantize_weights(quant="w8a8")``.
    """
    cfg = cfg_q
    assert cfg.quant == "w8a8", cfg.quant
    assert not cfg.fuse_qkv, "run SmoothQuant on the unfused tree, fuse after"
    assert not cfg.qkv_bias, (
        "qkv-bias models: the o-proj fold would also rescale bv; "
        "calibration folds for biased trees are unimplemented"
    )
    from composable_kernel_tpu.reference.quant import ref_quantize_per_channel

    toks = jnp.asarray(calib_tokens, jnp.int32)
    b, s_len = toks.shape
    hd = cfg.head_dim
    rep = cfg.n_heads // cfg.n_kv_heads
    x = jnp.take(params["embed"], toks, axis=0).astype(jnp.float32)
    cos, sin = llama.rope_cos_sin(jnp.arange(s_len), hd, cfg.rope_theta)

    def q_one(w64):
        w_q, sc = ref_quantize_per_channel(
            jnp.asarray(w64, jnp.float32), bits=8
        )
        deq = (np.asarray(w_q, np.float64)
               * np.asarray(sc, np.float64)[None, :])
        return {"q": w_q, "s": sc}, deq

    new_layers = []
    for layer in params["layers"]:
        new_l = {}
        h1 = _rms(x, layer["attn_norm"], cfg.norm_eps)
        x1 = np.asarray(h1.reshape(b * s_len, -1), np.float64)

        # --- qkv shared input scale -> attn_norm gamma ------------------
        w_cat = np.concatenate(
            [np.asarray(layer[nm], np.float64) for nm in ("wq", "wk", "wv")],
            axis=1,
        )
        s_qkv, _ = smoothquant_search_scale(w_cat, x1, n_grid=n_grid)
        new_l["attn_norm"] = jnp.asarray(
            np.asarray(layer["attn_norm"], np.float64) / s_qkv,
            np.asarray(layer["attn_norm"]).dtype,
        )
        x1s = x1 / s_qkv[None, :]
        deq = {}
        for nm in ("wq", "wk"):
            new_l[nm], deq[nm] = q_one(
                np.asarray(layer[nm], np.float64) * s_qkv[:, None]
            )
        wv_scaled = np.asarray(layer["wv"], np.float64) * s_qkv[:, None]

        qh = jnp.asarray(x1s @ deq["wq"], jnp.float32).reshape(b, s_len, -1, hd)
        kh = jnp.asarray(x1s @ deq["wk"], jnp.float32).reshape(b, s_len, -1, hd)
        vh = jnp.asarray(x1s @ wv_scaled, jnp.float32).reshape(b, s_len, -1, hd)
        qh = llama.apply_rope(qh.transpose(0, 2, 1, 3), cos, sin)
        kh = llama.apply_rope(kh.transpose(0, 2, 1, 3), cos, sin)
        o = ref_attention(qh, kh, vh.transpose(0, 2, 1, 3), causal=True,
                          out_dtype=jnp.float32)
        o2 = np.asarray(o.transpose(0, 2, 1, 3).reshape(b * s_len, -1),
                        np.float64)

        # --- o-proj input scale -> wv output columns (GQA-shared) -------
        s_o_raw, _ = smoothquant_search_scale(
            np.asarray(layer["wo"], np.float64), o2, n_grid=n_grid
        )
        s_o, s_o_kv = _gqa_group_scale(s_o_raw, cfg.n_kv_heads, rep, hd)
        new_l["wv"], deq_wv = q_one(wv_scaled / s_o_kv[None, :])
        new_l["wo"], deq_wo = q_one(
            np.asarray(layer["wo"], np.float64) * s_o[:, None]
        )
        vh_q = jnp.asarray(x1s @ deq_wv, jnp.float32).reshape(b, s_len, -1, hd)
        o_q = ref_attention(qh, kh, vh_q.transpose(0, 2, 1, 3), causal=True,
                            out_dtype=jnp.float32)
        # vh_q already carries the /s_o_kv fold, so o2_q is in the scaled
        # basis that deq_wo (wo * s_o) expects
        o2_q = np.asarray(
            o_q.transpose(0, 2, 1, 3).reshape(b * s_len, -1), np.float64
        )
        x = x + jnp.asarray(o2_q @ deq_wo, jnp.float32).reshape(b, s_len, -1)

        # --- gate/up shared input scale -> ffn_norm gamma ---------------
        h2 = _rms(x, layer["ffn_norm"], cfg.norm_eps)
        x2 = np.asarray(h2.reshape(b * s_len, -1), np.float64)
        gu_cat = np.concatenate(
            [np.asarray(layer["w_gate"], np.float64),
             np.asarray(layer["w_up"], np.float64)], axis=1,
        )
        s_gu, _ = smoothquant_search_scale(gu_cat, x2, n_grid=n_grid)
        new_l["ffn_norm"] = jnp.asarray(
            np.asarray(layer["ffn_norm"], np.float64) / s_gu,
            np.asarray(layer["ffn_norm"]).dtype,
        )
        x2s = x2 / s_gu[None, :]
        new_l["w_gate"], deq_g = q_one(
            np.asarray(layer["w_gate"], np.float64) * s_gu[:, None]
        )
        up_scaled = np.asarray(layer["w_up"], np.float64) * s_gu[:, None]

        gg = x2s @ deq_g
        hmid_fp = np.asarray(jax.nn.silu(jnp.asarray(gg, jnp.float32)),
                             np.float64) * (x2s @ up_scaled)

        # --- down-proj input scale -> w_up output columns ---------------
        s_d, _ = smoothquant_search_scale(
            np.asarray(layer["w_down"], np.float64), hmid_fp, n_grid=n_grid
        )
        new_l["w_up"], deq_u = q_one(up_scaled / s_d[None, :])
        hmid = np.asarray(jax.nn.silu(jnp.asarray(gg, jnp.float32)),
                          np.float64) * (x2s @ deq_u)
        new_l["w_down"], deq_d = q_one(
            np.asarray(layer["w_down"], np.float64) * s_d[:, None]
        )
        x = x + jnp.asarray(hmid @ deq_d, jnp.float32).reshape(b, s_len, -1)
        new_layers.append(new_l)

    out = dict(params)
    out["layers"] = new_layers
    if quant_lm_head:
        w_lm = np.asarray(params["lm_head"], np.float64)
        hf = _rms(x, params["norm"], cfg.norm_eps)
        xf = np.asarray(hf.reshape(b * s_len, -1), np.float64)
        s_lm, _ = smoothquant_search_scale(w_lm, xf, n_grid=n_grid)
        out["norm"] = jnp.asarray(
            np.asarray(params["norm"], np.float64) / s_lm,
            np.asarray(params["norm"]).dtype,
        )
        out["lm_head"], _ = q_one(w_lm * s_lm[:, None])
    return out


def _np_silu(x):
    return x / (1.0 + np.exp(-x))


def _gptq_moe(moe_w, x2, cfg, percdamp):
    """GPTQ for a Mixtral expert stack (models.moe layout).

    Per-expert Hessians come from the tokens the router actually sends
    there — the distribution each expert sees at inference. Experts with
    no routed calibration tokens fall back to RTN (an identity Hessian;
    an all-zero Hessian would zero the expert via the dead-row rule).
    Output layout matches ``quantize_moe_weights`` (per-channel int8
    stacks; the AND-only int4 pack when cfg.quant == "w4a8"). Returns
    (leaves, y [T, d] f64): y is the dense top-k combine computed from
    the DEQUANTIZED experts, for activation propagation.
    """
    from composable_kernel_tpu.models.moe import _route

    t, d = x2.shape
    e_total = moe_w["w_gate"].shape[0]
    w4a8 = cfg.quant == "w4a8"
    g = cfg.group_size
    w_r, idx = _route(
        jnp.asarray(x2, jnp.float32), moe_w["router"], cfg.top_k_experts
    )
    idx_np = np.asarray(idx)
    w_np = np.asarray(w_r, np.float64)

    def q_mat(w64, x_e):
        h = np.eye(w64.shape[0]) if x_e.shape[0] == 0 else _hessian(x_e)
        if w4a8:
            w_q, sc = gptq_matrix(w64, h, group_size=g, bits=4,
                                  percdamp=percdamp)
            return w_q, sc, w_q.astype(np.float64) * np.repeat(sc, g, axis=0)
        w_q, sc = gptq_matrix(w64, h, group_size=None, bits=8,
                              percdamp=percdamp)
        return w_q, sc, w_q.astype(np.float64) * sc[None, :]

    stacks = {k: ([], []) for k in ("w_gate", "w_up", "w_down")}
    y = np.zeros((t, d), np.float64)
    x64 = np.asarray(x2, np.float64)
    for e in range(e_total):
        mask = idx_np == e  # [T, top_k]
        rows = np.where(mask.any(axis=1))[0]
        x_e = x64[rows]
        wq_g, s_g, deq_g = q_mat(np.asarray(moe_w["w_gate"][e], np.float64), x_e)
        wq_u, s_u, deq_u = q_mat(np.asarray(moe_w["w_up"][e], np.float64), x_e)
        hmid_e = _np_silu(x_e @ deq_g) * (x_e @ deq_u)
        wq_d, s_d, deq_d = q_mat(np.asarray(moe_w["w_down"][e], np.float64),
                                 hmid_e)
        gate_w = (w_np * mask).sum(axis=1)  # [T]
        y[rows] += gate_w[rows, None] * (hmid_e @ deq_d)
        for k, (wq, sc) in zip(("w_gate", "w_up", "w_down"),
                               ((wq_g, s_g), (wq_u, s_u), (wq_d, s_d))):
            stacks[k][0].append(wq)
            stacks[k][1].append(sc)

    leaves = {"router": moe_w["router"]}
    for k, (wqs, scs) in stacks.items():
        if w4a8:
            leaves[k] = {
                "q": jnp.stack([dtypes.pack_int4_w4a8(jnp.asarray(q))
                                for q in wqs]),
                "s": jnp.stack([jnp.asarray(s, jnp.float32) for s in scs]),
                "gs": g,
            }
        else:
            leaves[k] = {
                "q": jnp.stack([jnp.asarray(q) for q in wqs]),
                "s": jnp.stack([jnp.asarray(s, jnp.float32) for s in scs]),
            }
    return leaves, y


def gptq_quantize_llama(params, cfg_q: llama.LlamaConfig, calib_tokens,
                        *, percdamp: float = 0.01,
                        quant_lm_head: bool = True):
    """Quantize a full-precision Llama tree with GPTQ calibration.

    params: full-precision tree (``llama.init_weights`` layout, unfused).
    cfg_q:  target config (quant="w4a16" group-wise or "int8" per-channel).
    calib_tokens: [n_calib, seq] int32 calibration windows.

    Activations are computed with the f32 jnp reference path, propagated
    through already-quantized layers (GPTQ layer sequencing). Returns a
    tree interchangeable with ``llama.quantize_weights`` output.
    """
    cfg = cfg_q
    quant = _Quantizer(cfg, percdamp)
    toks = jnp.asarray(calib_tokens, jnp.int32)
    b, s = toks.shape
    hd = cfg.head_dim

    x = jnp.take(params["embed"], toks, axis=0).astype(jnp.float32)
    cos, sin = llama.rope_cos_sin(jnp.arange(s), hd, cfg.rope_theta)

    new_layers = []
    for layer in params["layers"]:
        h1 = _rms(x, layer["attn_norm"], cfg.norm_eps)  # [B, S, d]
        x1 = np.asarray(h1.reshape(b * s, -1))
        new_l = {"attn_norm": layer["attn_norm"], "ffn_norm": layer["ffn_norm"]}
        deq = {}
        if cfg.fuse_qkv:
            # q/k/v share the input (same Hessian): one fused GPTQ pass on
            # the concatenated weight, exactly matching quantize_weights'
            # fused layout (output columns are independent in GPTQ)
            w_cat = np.concatenate(
                [np.asarray(layer[n], np.float32) for n in ("wq", "wk", "wv")],
                axis=1,
            )
            new_l["wqkv"], deq_cat = quant(w_cat, x1)
            n_q = cfg.n_heads * cfg.head_dim
            n_kv = cfg.n_kv_heads * cfg.head_dim
            deq["wq"] = deq_cat[:, :n_q]
            deq["wk"] = deq_cat[:, n_q : n_q + n_kv]
            deq["wv"] = deq_cat[:, n_q + n_kv :]
        else:
            for name in ("wq", "wk", "wv"):
                new_l[name], deq[name] = quant(np.asarray(layer[name], np.float32), x1)

        # Qwen2-style biases: pass through full-precision (GPTQ quantizes
        # weights only) and include them in the propagated activations so
        # downstream Hessians see the true input distribution
        bias = {n: jnp.asarray(layer[n], jnp.float32)
                for n in ("bq", "bk", "bv") if n in layer}
        if bias and cfg.fuse_qkv:
            new_l["bqkv"] = jnp.concatenate(
                [layer["bq"], layer["bk"], layer["bv"]]
            )
        else:
            new_l.update({n: layer[n] for n in bias})

        def lin(inp, w_f32, b_name=None):
            out_ = jnp.matmul(inp, jnp.asarray(w_f32))
            if b_name in bias:
                out_ = out_ + bias[b_name]
            return out_

        q = lin(h1.reshape(b * s, -1), deq["wq"], "bq").reshape(b, s, -1, hd)
        k = lin(h1.reshape(b * s, -1), deq["wk"], "bk").reshape(b, s, -1, hd)
        v = lin(h1.reshape(b * s, -1), deq["wv"], "bv").reshape(b, s, -1, hd)
        q = llama.apply_rope(q.transpose(0, 2, 1, 3), cos, sin)
        k = llama.apply_rope(k.transpose(0, 2, 1, 3), cos, sin)
        v = v.transpose(0, 2, 1, 3)
        o = ref_attention(q, k, v, causal=True, out_dtype=jnp.float32)
        o2 = o.transpose(0, 2, 1, 3).reshape(b * s, -1)

        new_l["wo"], deq_wo = quant(
            np.asarray(layer["wo"], np.float32), np.asarray(o2),
            row_parallel=True,
        )
        x = x + lin(o2, deq_wo).reshape(b, s, -1)

        h2 = _rms(x, layer["ffn_norm"], cfg.norm_eps)
        x2 = np.asarray(h2.reshape(b * s, -1))
        if "moe" in layer:
            new_l["moe"], y = _gptq_moe(layer["moe"], x2, cfg, percdamp)
            x = x + jnp.asarray(y, jnp.float32).reshape(b, s, -1)
            new_layers.append(new_l)
            continue
        if cfg.fuse_qkv:
            gu = np.concatenate(
                [np.asarray(layer["w_gate"], np.float32),
                 np.asarray(layer["w_up"], np.float32)], axis=1,
            )
            new_l["w_gateup"], deq_gu = quant(gu, x2)
            f = cfg.ffn_dim
            deq_g, deq_u = deq_gu[:, :f], deq_gu[:, f:]
        else:
            new_l["w_gate"], deq_g = quant(np.asarray(layer["w_gate"], np.float32), x2)
            new_l["w_up"], deq_u = quant(np.asarray(layer["w_up"], np.float32), x2)
        gg = lin(h2.reshape(b * s, -1), deq_g)
        uu = lin(h2.reshape(b * s, -1), deq_u)
        hmid = jax.nn.silu(gg) * uu
        new_l["w_down"], deq_d = quant(
            np.asarray(layer["w_down"], np.float32), np.asarray(hmid),
            row_parallel=True,
        )
        x = x + lin(hmid, deq_d).reshape(b, s, -1)
        new_layers.append(new_l)

    out = dict(params)
    out["layers"] = new_layers
    if quant_lm_head:
        hf = _rms(x, params["norm"], cfg.norm_eps)
        out["lm_head"], _ = quant(
            np.asarray(params["lm_head"], np.float32),
            np.asarray(hf.reshape(b * s, -1)),
        )
    return out


def gptq_quantize_gpt2(params, cfg_q, calib_tokens, *, percdamp: float = 0.01):
    """GPTQ for the GPT-2 family (models/gpt2.py).

    Same layer-sequential flow as ``gptq_quantize_llama``, walking GPT-2's
    four linears (w_qkv / w_proj / w_fc / w_out) with the f32 reference
    activations (LayerNorm with bias, learned positions, fused-QKV single
    Hessian — the c_attn weight ships fused, so one pass covers q/k/v).
    The tied embedding head stays unquantized, matching
    ``gpt2.quantize_weights``. Returns an interchangeable tree.
    """
    from composable_kernel_tpu.models import gpt2 as g2
    from composable_kernel_tpu.ops import epilogues as ep

    cfg = cfg_q
    quant = _Quantizer(cfg, percdamp)  # duck-typed: quant/group_size/tp_pack
    toks = jnp.asarray(calib_tokens, jnp.int32)
    b, s = toks.shape
    hd, nh = cfg.head_dim, cfg.n_heads

    def ln(x, g, bta):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        return (xf - mu) * jax.lax.rsqrt(var + cfg.norm_eps) * g + bta

    x = (
        jnp.take(params["wte"], toks, axis=0)
        + params["wpe"][None, :s]
    ).astype(jnp.float32)

    new_layers = []
    for layer in params["layers"]:
        new_l = dict(layer)
        h1 = ln(x, layer["ln1_g"], layer["ln1_b"])
        x1 = np.asarray(h1.reshape(b * s, -1))
        new_l["w_qkv"], deq_qkv = quant(np.asarray(layer["w_qkv"], np.float32), x1)
        qkv = x1 @ deq_qkv + np.asarray(layer["b_qkv"], np.float32)
        q, k, v = np.split(qkv, 3, axis=-1)

        def heads(t):
            return jnp.asarray(t, jnp.float32).reshape(b, s, nh, hd).transpose(
                0, 2, 1, 3
            )

        o = ref_attention(heads(q), heads(k), heads(v), causal=True,
                          out_dtype=jnp.float32)
        o2 = np.asarray(o.transpose(0, 2, 1, 3).reshape(b * s, -1))
        new_l["w_proj"], deq_p = quant(np.asarray(layer["w_proj"], np.float32), o2)
        x = x + jnp.asarray(
            o2 @ deq_p + np.asarray(layer["b_proj"], np.float32), jnp.float32
        ).reshape(b, s, -1)

        h2 = ln(x, layer["ln2_g"], layer["ln2_b"])
        x2 = np.asarray(h2.reshape(b * s, -1))
        new_l["w_fc"], deq_fc = quant(np.asarray(layer["w_fc"], np.float32), x2)
        hmid = np.asarray(
            ep.fast_gelu(
                jnp.asarray(x2 @ deq_fc + np.asarray(layer["b_fc"], np.float32),
                            jnp.float32)
            )
        )
        new_l["w_out"], deq_o = quant(np.asarray(layer["w_out"], np.float32), hmid)
        x = x + jnp.asarray(
            hmid @ deq_o + np.asarray(layer["b_out"], np.float32), jnp.float32
        ).reshape(b, s, -1)
        new_layers.append(new_l)

    out = dict(params)
    out["layers"] = new_layers
    return out
