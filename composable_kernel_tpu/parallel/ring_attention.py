"""Ring attention: sequence parallelism across chips over ICI.

The cross-chip long-context capability SURVEY.md §5 commits to ("same
blockwise kernel ... plus cross-chip sequence scaling via ppermute ring
attention over ICI") — entirely outside the single-GPU reference's scope.

Algorithm (Liu et al. ring attention, on the S3 flash kernel):
  - the sequence axis is sharded over ``axis_name``: each device holds
    Q/K/V chunks of S_local tokens;
  - n_devices steps: compute flash attention of the local Q against the
    currently-held K/V chunk (with the chunk's *global* causal offset,
    threaded into the kernel as a traced per-batch offset), accumulate
    via log-sum-exp combination, then rotate K/V one hop around the ring
    with ``jax.lax.ppermute`` — XLA overlaps the permute with the next
    step's compute over ICI.

Runs inside ``shard_map``; combine math matches the split-KV decode
combine (fmha_fwd_splitkv_combine_kernel analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from composable_kernel_tpu.ops.attention import flash_attention

__all__ = ["ring_attention"]

_NEG = -1e30


def ring_attention(
    q,
    k,
    v,
    axis_name: str,
    *,
    scale: float | None = None,
    causal: bool = False,
    config=None,
    interpret=None,
):
    """Sequence-parallel attention inside shard_map.

    q, k, v: [B, H, S_local, D] — the local sequence shard; the global
    sequence is the concatenation over ``axis_name`` in ring order.
    Returns the local O shard [B, H, S_local, D].
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, hq, s_local, d = q.shape

    o_acc = jnp.zeros(q.shape, jnp.float32)
    lse_acc = jnp.full((b, hq, s_local), _NEG, jnp.float32)

    def combine(o1, l1, o2, l2):
        m = jnp.maximum(l1, l2)
        m_safe = jnp.where(m > _NEG / 2, m, 0.0)
        w1 = jnp.exp(l1 - m_safe)
        w2 = jnp.exp(l2 - m_safe)
        denom = jnp.maximum(w1 + w2, 1e-30)
        o = (o1 * w1[..., None] + o2 * w2[..., None]) / denom[..., None]
        lse = jnp.where(m > _NEG / 2, m_safe + jnp.log(denom), _NEG)
        return o, lse

    perm = [(i, (i + 1) % n) for i in range(n)]
    for step in range(n):
        src = (idx - step) % n  # ring position of the chunk currently held
        if causal:
            # query i (global idx*S+i) may attend key j (global src*S+j)
            # iff j <= i + (idx - src) * S_local
            offset = ((idx - src) * s_local).astype(jnp.int32)
            offs = jnp.broadcast_to(offset, (b,))
            # chunks strictly in the future contribute nothing but still
            # run (uniform control flow); their rows come back fully
            # masked with lse = -inf and drop out of the combine
            o_i, lse_i = flash_attention(
                q, k, v, scale=scale, causal=True, causal_offset=offs,
                config=config, return_lse=True, out_dtype=jnp.float32,
                interpret=interpret,
            )
        else:
            o_i, lse_i = flash_attention(
                q, k, v, scale=scale, config=config, return_lse=True,
                out_dtype=jnp.float32, interpret=interpret,
            )
        o_acc, lse_acc = combine(o_acc, lse_acc, o_i, lse_i)
        if step != n - 1:
            k = jax.lax.ppermute(k, axis_name, perm)
            v = jax.lax.ppermute(v, axis_name, perm)
    return o_acc.astype(q.dtype)
