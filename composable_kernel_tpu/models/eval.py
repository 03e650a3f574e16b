"""Accuracy-gate harness: tokenizer + perplexity evaluation.

The reference ships no accuracy evaluation (it is a kernel library; its
"accuracy" surface is per-op check_err vs host references, SURVEY.md §4).
The quantized-inference north star adds a model-level gate: W4A16
perplexity within 0.1 of the full-precision model (BASELINE.json). This
module supplies the tokenizer + NLL/perplexity machinery; the checkpoint
under ``checkpoints/`` is produced by ``scripts/train_tiny_lm.py`` (no
egress in this environment — a locally trained LM is the largest
obtainable real checkpoint, and a *trained* model is required for the
delta to be meaningful: random weights have near-uniform logits whose
quantization error washes out).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from composable_kernel_tpu.models import llama

__all__ = ["ByteTokenizer", "corpus_tokens", "nll", "perplexity", "ppl_delta"]


class ByteTokenizer:
    """UTF-8 byte-level tokenizer: ids 0..255 are bytes, 256 is BOS.

    Matches the vocab of the shipped tiny checkpoint. For HF checkpoints
    use the real tokenizer via ``transformers`` (models/loader.py path);
    this class keeps the gate dependency-free and deterministic.
    """

    bos_id = 256
    vocab_size = 512  # padded to an MXU-friendly lm_head width

    def encode(self, text: str, add_bos: bool = True) -> np.ndarray:
        b = list(text.encode("utf-8"))
        if add_bos:
            b = [self.bos_id] + b
        return np.asarray(b, np.int32)

    def decode(self, ids) -> str:
        ids = [int(i) for i in np.asarray(ids).reshape(-1) if int(i) < 256]
        return bytes(ids).decode("utf-8", errors="replace")


def corpus_tokens(paths, tokenizer: ByteTokenizer | None = None,
                  max_bytes: int | None = None) -> np.ndarray:
    """Concatenate text files into one token stream (BOS between docs)."""
    tok = tokenizer or ByteTokenizer()
    out, total = [], 0
    for p in paths:
        try:
            text = Path(p).read_text(errors="ignore")
        except OSError:
            continue
        ids = tok.encode(text)
        out.append(ids)
        total += len(ids)
        if max_bytes is not None and total >= max_bytes:
            break
    assert out, "no readable corpus files"
    stream = np.concatenate(out)
    return stream[:max_bytes] if max_bytes else stream


def _windows(tokens: np.ndarray, seq_len: int) -> np.ndarray:
    """[n, seq_len+1] non-overlapping context windows (targets shifted)."""
    n = (len(tokens) - 1) // seq_len
    assert n > 0, (len(tokens), seq_len)
    out = np.empty((n, seq_len + 1), np.int32)
    for i in range(n):
        out[i] = tokens[i * seq_len : i * seq_len + seq_len + 1]
    return out


def nll(params, cfg: llama.LlamaConfig, tokens: np.ndarray, *,
        seq_len: int = 256, batch_size: int = 8, kernels: bool = True,
        interpret=None, max_windows: int | None = None) -> float:
    """Mean per-token negative log-likelihood over a token stream.

    Non-overlapping ``seq_len`` windows, batched; each batch is one jit'd
    forward (the same path the serving engine uses when ``kernels=True``).
    """
    wins = _windows(np.asarray(tokens), seq_len)
    if max_windows is not None:
        wins = wins[:max_windows]
    # pad to a whole number of batches with a weight mask
    n = len(wins)
    n_pad = (-n) % batch_size
    if n_pad:
        wins = np.concatenate([wins, np.tile(wins[-1:], (n_pad, 1))])

    @jax.jit
    def batch_nll(p, w):
        logits = llama.forward(p, w[:, :-1], cfg, kernels=kernels,
                               interpret=interpret)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, w[:, 1:, None], axis=-1)[..., 0]
        return -jnp.sum(ll, axis=-1)  # [B] total nll per window

    totals = []
    for i in range(0, len(wins), batch_size):
        totals.append(np.asarray(batch_nll(params, jnp.asarray(wins[i : i + batch_size]))))
    per_window = np.concatenate(totals)[:n]
    return float(per_window.sum() / (n * seq_len))


def perplexity(params, cfg, tokens, **kw) -> float:
    return math.exp(nll(params, cfg, tokens, **kw))


def ppl_delta(params_full, cfg_full: llama.LlamaConfig,
              cfg_quant: llama.LlamaConfig, tokens, **kw):
    """(ppl_full, ppl_quant, delta) for the BASELINE accuracy gate.

    ``params_full`` is the unquantized tree; the quantized tree is derived
    from it with ``llama.quantize_weights`` under ``cfg_quant`` so both
    evals share identical underlying weights.
    """
    params_q = llama.quantize_weights(params_full, cfg_quant)
    p_full = perplexity(params_full, cfg_full, tokens, **kw)
    p_quant = perplexity(params_q, cfg_quant, tokens, **kw)
    return p_full, p_quant, p_quant - p_full
