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

__all__ = ["gptq_matrix", "gptq_quantize_llama"]


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
        assert cfg.quant in ("w4a16", "int8"), cfg.quant
        self.cfg = cfg
        self.percdamp = percdamp

    def __call__(self, w, x, row_parallel=False):
        """Quantize W [K, N] with inputs x [T, K]; returns the param leaf
        and the dequantized f32 weight (for propagating activations)."""
        cfg = self.cfg
        h = _hessian(x)
        if cfg.quant == "int8":
            w_q, s = gptq_matrix(w, h, group_size=None, bits=8,
                                 percdamp=self.percdamp)
            deq = w_q.astype(np.float32) * s[None, :]
            return {"q": jnp.asarray(w_q), "s": jnp.asarray(s)}, deq
        w_q, s = gptq_matrix(w, h, group_size=cfg.group_size, bits=4,
                             percdamp=self.percdamp)
        deq = w_q.astype(np.float32) * np.repeat(s, cfg.group_size, axis=0)
        blocks = cfg.tp_pack if row_parallel else 1
        packed = dtypes.pack_int4(jnp.asarray(w_q), axis=0, blocks=blocks)
        return {"q": packed, "s": jnp.asarray(s)}, deq


def _rms(x, gamma, eps):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(ms + eps) * gamma.astype(jnp.float32)


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

        def lin(inp, w_f32):
            return jnp.matmul(inp, jnp.asarray(w_f32))

        q = lin(h1.reshape(b * s, -1), deq["wq"]).reshape(b, s, -1, hd)
        k = lin(h1.reshape(b * s, -1), deq["wk"]).reshape(b, s, -1, hd)
        v = lin(h1.reshape(b * s, -1), deq["wv"]).reshape(b, s, -1, hd)
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
