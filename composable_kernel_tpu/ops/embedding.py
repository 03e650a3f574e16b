"""Sparse embedding + fused layernorm.

CK surface: ``device_sparse_embeddings_forward_layernorm.hpp``
(example/36_sparse_embedding): gather rows from E embedding tables, sum
them per output row, then layernorm. On TPU the gathers are XLA dynamic
gathers (HBM-bandwidth bound, already optimal) and the sum+layernorm run
through the Pallas layernorm kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

from composable_kernel_tpu.ops.normalization import layernorm

__all__ = ["sparse_embedding_layernorm"]


def sparse_embedding_layernorm(
    tables,
    indices,
    gamma,
    beta,
    *,
    eps=1e-4,
    out_dtype=None,
    interpret=None,
):
    """y[R, D] = layernorm(sum_t tables[t][indices[t][r]]) * gamma + beta.

    tables:  list of [V_t, D] embedding matrices
    indices: list of [R] int32 row indices (one per table)
    """
    acc = None
    for tab, idx in zip(tables, indices):
        row = jnp.take(tab.astype(jnp.float32), idx, axis=0)
        acc = row if acc is None else acc + row
    y = layernorm(acc, gamma, beta, eps=eps, interpret=interpret)
    return y.astype(out_dtype or tables[0].dtype)
