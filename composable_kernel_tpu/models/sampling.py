"""Device-side token sampling: temperature / top-k / top-p (nucleus).

The serving layer's sampler (reference has no serving stack at all).
Everything runs on device inside the decode jit — only sampled token ids
cross the host boundary (a [B, V] logits readback through the tunneled
runtime would cost ~1 s/step; token ids are bytes). Per-slot parameters
are arrays so one compiled step serves heterogeneous requests:

  temperature[b] == 0      -> greedy (argmax) for that slot
  top_k[b] == 0            -> no top-k cut
  top_p[b] == 1            -> no nucleus cut

Sampling uses the Gumbel-max trick on the masked logits (categorical
sampling without normalizing), with a fresh fold of the step counter into
the key each call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["sample_logits"]

_NEG = -1e30


def sample_logits(logits, key, *, temperature=None, top_k=None, top_p=None):
    """logits [B, V] -> sampled ids [B] int32.

    temperature: [B] f32 (0 = greedy). top_k: [B] int32 (0 = off).
    top_p: [B] f32 (1 = off). Defaults mean greedy for every slot.
    """
    b, v = logits.shape
    lg = logits.astype(jnp.float32)
    if temperature is None:
        temperature = jnp.zeros((b,), jnp.float32)
    if top_k is None:
        top_k = jnp.zeros((b,), jnp.int32)
    if top_p is None:
        top_p = jnp.ones((b,), jnp.float32)
    temperature = jnp.asarray(temperature, jnp.float32)
    top_k = jnp.asarray(top_k, jnp.int32)
    top_p = jnp.asarray(top_p, jnp.float32)

    greedy_ids = jnp.argmax(lg, axis=-1).astype(jnp.int32)

    # rank of every vocab entry per row (0 = best) via descending argsort
    order = jnp.argsort(-lg, axis=-1)  # [B, V] ids by rank
    ranks = jnp.zeros((b, v), jnp.int32).at[
        jnp.arange(b)[:, None], order
    ].set(jnp.broadcast_to(jnp.arange(v, dtype=jnp.int32), (b, v)))

    # top-k mask (0 = disabled)
    k_eff = jnp.where(top_k > 0, top_k, v)[:, None]
    keep = ranks < k_eff

    # top-p: keep the smallest prefix of sorted probs whose mass >= p
    # (the first token is always kept)
    temp_safe = jnp.maximum(temperature, 1e-6)[:, None]
    sorted_lg = jnp.take_along_axis(lg, order, axis=-1) / temp_safe
    probs = jax.nn.softmax(sorted_lg, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    sorted_keep = (cum - probs) < top_p[:, None]  # mass BEFORE this token
    keep &= jnp.take_along_axis(
        sorted_keep, ranks, axis=-1
    )

    masked = jnp.where(keep, lg / temp_safe, _NEG)
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (b, v), jnp.float32, 1e-20, 1.0)
    ))
    sampled_ids = jnp.argmax(masked + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temperature > 0, sampled_ids, greedy_ids)
