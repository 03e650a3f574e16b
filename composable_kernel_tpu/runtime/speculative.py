"""Greedy speculative decoding (draft-verify) over the serving kernels.

A serving-latency feature beyond the reference's scope (CK has no serving
layer at all): a small draft model proposes K-1 greedy tokens with cheap
decode steps; the target verifies the whole chunk in ONE prefill-style
step (`llama.prefill_chunk_step` — the same fixed-shape chunk machinery
chunked prefill uses) and commits the longest draft prefix that matches
its own greedy choices, plus one corrected/bonus token. With greedy
acceptance the output is IDENTICAL to target-only greedy decoding — the
tests assert exact equality — while the target runs `committed/K`-fewer
sequential steps.

Cache discipline: rejected draft rows are never rolled back — positions
past the committed length are masked by ``kv_seq_len`` in every kernel
and overwritten in place when real tokens reach those slots (the same
invariant the continuous-batching engine relies on).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from composable_kernel_tpu.models import llama

__all__ = ["generate_speculative", "generate_speculative_batched"]


def generate_speculative(
    params_target,
    cfg_target: llama.LlamaConfig,
    params_draft,
    cfg_draft: llama.LlamaConfig,
    prompt,
    n_steps: int,
    *,
    chunk: int = 4,
    kernels: bool = True,
    interpret=None,
):
    """Greedy speculative decode: returns (tokens [1, len+n_steps], stats).

    prompt: [1, S] int32. The draft and target must share the vocabulary.
    stats: dict with rounds / draft_steps / accepted counts.
    """
    import jax

    prompt = jnp.asarray(prompt, jnp.int32)
    b, s0 = prompt.shape
    assert b == 1, "speculative loop is per-sequence"
    kw = dict(kernels=kernels, interpret=interpret)

    # prefill both models
    logits_t, seeds_t = llama.forward(
        params_target, prompt, cfg_target, return_cache=True, **kw
    )
    cache_t = llama.seed_kv_cache(
        llama.init_kv_cache(cfg_target, 1), seeds_t, cfg_target
    )
    _, seeds_d = llama.forward(
        params_draft, prompt, cfg_draft, return_cache=True, **kw
    )
    cache_d = llama.seed_kv_cache(
        llama.init_kv_cache(cfg_draft, 1), seeds_d, cfg_draft
    )

    out = list(np.asarray(prompt[0]))
    pending = int(jnp.argmax(logits_t[0, -1]))  # next token, not yet in caches
    p = s0  # tokens processed into both caches
    stats = {"rounds": 0, "draft_steps": 0, "accepted": 0, "committed": 0}

    draft_step = jax.jit(
        lambda prm, c, t, pos: llama.decode_step_batched(
            prm, c, t, pos, cfg_draft, **kw
        )
    )
    verify_step = jax.jit(
        lambda prm, c, t, pos: llama.prefill_chunk_step(
            prm, c, t, pos, cfg_target, **kw
        )
    )

    target_len = s0 + n_steps
    while len(out) + 1 < target_len + 1 and len(out) - s0 < n_steps:
        k = min(chunk, cfg_target.max_seq_len - p, target_len - len(out))
        if k < 1:
            break
        # draft proposes k-1 tokens (k==1 degrades to plain decode)
        proposals = []
        tok = pending
        for i in range(k - 1):
            lg, cache_d = draft_step(
                params_draft, cache_d, jnp.asarray([[tok]], jnp.int32),
                jnp.asarray([p + i], jnp.int32),
            )
            tok = int(jnp.argmax(lg[0, -1]))
            proposals.append(tok)
            stats["draft_steps"] += 1

        # target verifies [pending, proposals...] in one chunk step
        chunk_toks = jnp.asarray([[pending] + proposals], jnp.int32)
        lg_t, cache_t = verify_step(params_target, cache_t, chunk_toks, p)
        targets = [int(t) for t in np.asarray(jnp.argmax(lg_t[0], axis=-1))]

        n_acc = 0
        while n_acc < len(proposals) and proposals[n_acc] == targets[n_acc]:
            n_acc += 1
        if proposals and n_acc == len(proposals):
            # fully accepted: the draft never consumed its own last
            # proposal — fill that cache row so the next round's draft
            # context has no gap (output correctness never depends on the
            # draft; this only preserves acceptance quality)
            _, cache_d = draft_step(
                params_draft, cache_d,
                jnp.asarray([[proposals[-1]]], jnp.int32),
                jnp.asarray([p + k - 1], jnp.int32),
            )
        committed = [pending] + proposals[:n_acc]
        out.extend(committed)
        pending = targets[n_acc]  # corrected (or bonus) token
        p += len(committed)
        # draft cache re-sync: it consumed the chunk rows too; committed
        # prefix matches, stale rows are masked/overwritten (see module doc)
        stats["rounds"] += 1
        stats["accepted"] += n_acc
        stats["committed"] += len(committed)

    # flush remaining budget one token at a time (tail of the window)
    while len(out) - s0 < n_steps:
        out.append(pending)
        if len(out) - s0 >= n_steps:
            break
        lg_t, cache_t = verify_step(
            params_target, cache_t, jnp.asarray([[pending]], jnp.int32), p
        )
        pending = int(jnp.argmax(lg_t[0, -1]))
        p += 1

    return jnp.asarray([out[: s0 + n_steps]], jnp.int32), stats


def generate_speculative_batched(
    params_target,
    cfg_target: llama.LlamaConfig,
    params_draft,
    cfg_draft: llama.LlamaConfig,
    prompts,
    n_steps: int,
    *,
    chunk: int = 4,
    kernels: bool = True,
    interpret=None,
):
    """Batched greedy speculative decode: prompts [B, S] -> [B, S + n_steps].

    All B sequences draft and verify in lockstep (one [B, 1] draft step per
    proposal, one [B, K] verify step per round); acceptance lengths diverge
    per sequence, so from round two on every sequence runs at its own cache
    position — the draft steps use ``decode_step_batched``'s per-slot
    positions and the verify step uses ``prefill_chunk_step``'s per-slot
    offset mode. Output is exactly target-only greedy decoding per row.

    Cache discipline matches the per-sequence loop (module docstring):
    rejected rows stay in place, masked by kv_seq_len, overwritten later.
    Sequences that hit their budget early keep riding the batch (their
    positions freeze; writes land on masked rows) so batch shapes never
    change and nothing recompiles.
    """
    import jax

    prompts = jnp.asarray(prompts, jnp.int32)
    b, s0 = prompts.shape
    assert s0 + n_steps + chunk <= cfg_target.max_seq_len, (
        "needs chunk slack past the output window (frozen finished rows "
        "keep verifying at their final position)"
    )
    kw = dict(kernels=kernels, interpret=interpret)

    logits_t, seeds_t = llama.forward(
        params_target, prompts, cfg_target, return_cache=True, **kw
    )
    cache_t = llama.seed_kv_cache(
        llama.init_kv_cache(cfg_target, b), seeds_t, cfg_target
    )
    _, seeds_d = llama.forward(
        params_draft, prompts, cfg_draft, return_cache=True, **kw
    )
    cache_d = llama.seed_kv_cache(
        llama.init_kv_cache(cfg_draft, b), seeds_d, cfg_draft
    )

    out = [list(row) for row in np.asarray(prompts)]
    pending = [int(t) for t in np.asarray(jnp.argmax(logits_t[:, -1], axis=-1))]
    p = np.full((b,), s0, np.int64)  # tokens in both caches, per sequence
    stats = {"rounds": 0, "draft_steps": 0, "accepted": 0, "committed": 0}

    draft_step = jax.jit(
        lambda prm, c, t, pos: llama.decode_step_batched(
            prm, c, t, pos, cfg_draft, **kw
        )
    )
    verify_step = jax.jit(
        lambda prm, c, t, pos: llama.prefill_chunk_step(
            prm, c, t, pos, cfg_target, **kw
        )
    )

    def remaining(i):
        return n_steps - (len(out[i]) - s0)

    k = chunk
    while any(remaining(i) > 0 for i in range(b)):
        # draft proposes k-1 tokens for every row in lockstep
        proposals = [[] for _ in range(b)]
        tok = list(pending)
        for i in range(k - 1):
            lg, cache_d = draft_step(
                params_draft, cache_d,
                jnp.asarray(tok, jnp.int32)[:, None],
                jnp.asarray(p + i, jnp.int32),
            )
            tok = [int(t) for t in np.asarray(jnp.argmax(lg[:, -1], axis=-1))]
            for i2 in range(b):
                proposals[i2].append(tok[i2])
            stats["draft_steps"] += 1

        chunk_toks = jnp.asarray(
            [[pending[i]] + proposals[i] for i in range(b)], jnp.int32
        )
        lg_t, cache_t = verify_step(
            params_target, cache_t, chunk_toks, jnp.asarray(p, jnp.int32)
        )
        targets = np.asarray(jnp.argmax(lg_t, axis=-1))  # [B, k]

        full = np.zeros((b,), bool)
        for i in range(b):
            if remaining(i) <= 0:
                continue
            n_acc = 0
            while (
                n_acc < len(proposals[i])
                and proposals[i][n_acc] == targets[i][n_acc]
            ):
                n_acc += 1
            committed = ([pending[i]] + proposals[i][:n_acc])[: remaining(i)]
            out[i].extend(committed)
            full[i] = n_acc == len(proposals[i]) and len(committed) == n_acc + 1
            pending[i] = int(targets[i][n_acc])
            p[i] += len(committed)
            stats["accepted"] += n_acc
            stats["committed"] += len(committed)
        stats["rounds"] += 1

        if full.any() and k > 1:
            # fill the draft's last cache row for fully-accepted rows (the
            # draft never consumed its own final proposal; the row at p-1
            # belongs to that token). Rows that were NOT fully accepted must
            # not be touched at p-1 — it is live committed context for them
            # — so they take a dummy write at p, the next free slot, which
            # the following round's first draft step overwrites anyway.
            _, cache_d = draft_step(
                params_draft, cache_d,
                jnp.asarray([pr[-1] for pr in proposals], jnp.int32)[:, None],
                jnp.asarray(p - full.astype(np.int64), jnp.int32),
            )

    return (
        jnp.asarray([row[: s0 + n_steps] for row in out], jnp.int32),
        stats,
    )
