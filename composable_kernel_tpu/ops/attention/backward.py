"""Flash-attention backward kernels + custom VJP.

CK analog: ck_tile ``ops/fmha/kernel/fmha_bwd_kernel.hpp`` and its
dq_dk_dv pipelines (``block_fmha_bwd_pipeline_*``): recompute P blockwise
from (Q, K, LSE), then

    D  = rowsum(dO * O)                     (preprocess kernel)
    P  = exp(scale * Q K^T - LSE)
    dV = P^T dO
    dP = dO V^T
    dS = P * (dP - D) * scale
    dQ = dS K        (one kernel, grid over Q blocks, KV sequential)
    dK = dS^T Q      (second kernel, grid over KV blocks, Q sequential)

Two passes exactly like CK's bwd split: TPU has no cross-program atomics,
so dQ accumulates in the kernel whose grid owns Q blocks and dK/dV in the
one that owns KV blocks. GQA folds the head group into the dK/dV reduce
outside the kernel (jnp sum — XLA fuses).

``flash_attention_grad`` is the differentiable entry point (jax.custom_vjp
around the S3 forward); the plain ``flash_attention`` stays VJP-free for
inference use.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.attention.config import AttentionConfig
from composable_kernel_tpu.ops.attention.kernel import _LANES, _NEG_INF, flash_attention
from composable_kernel_tpu.ops.gemm.kernel import _ceil_mult, _interpret_default, pad_to

__all__ = ["flash_attention_grad"]


def _mask(q_blk, kv_idx, bq, bk, q_offset, causal, window, kv_len):
    q_pos = q_blk * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + q_offset
    k_pos = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    m = k_pos < kv_len
    if causal:
        m &= k_pos <= q_pos
    if window is not None:
        m &= k_pos > q_pos - window
    return m


def _bwd_dq_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, acc,
    *, scale, causal, window, n_kv_steps, bq, bk, q_offset,
):
    kv_idx = pl.program_id(2)
    q_blk = pl.program_id(1)
    bh = pl.program_id(0)

    @pl.when(kv_idx == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]      # [bq, LANES] broadcast
    delta = delta_ref[0]  # [bq, LANES]

    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = _mask(q_blk, kv_idx, bq, bk, q_offset, causal, window, lens_ref[bh])
    p = jnp.where(m, jnp.exp(s - lse[:, :1]), 0.0)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta[:, :1]) * scale
    acc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(kv_idx == n_kv_steps - 1)
    def _():
        dq_ref[0] = acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    lens_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, kacc, vacc,
    *, scale, causal, window, n_q_steps, bq, bk, q_offset,
):
    q_idx = pl.program_id(2)
    kv_blk = pl.program_id(1)
    bh = pl.program_id(0)

    @pl.when(q_idx == 0)
    def _():
        kacc[...] = jnp.zeros_like(kacc)
        vacc[...] = jnp.zeros_like(vacc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]
    delta = delta_ref[0]

    s = scale * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = _mask(q_idx, kv_blk, bq, bk, q_offset, causal, window, lens_ref[bh])
    p = jnp.where(m, jnp.exp(s - lse[:, :1]), 0.0)
    # dV += P^T dO
    vacc[...] += jax.lax.dot_general(
        p.astype(do_ref.dtype), do.astype(do_ref.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta[:, :1]) * scale
    # dK += dS^T Q
    kacc[...] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(q_idx == n_q_steps - 1)
    def _():
        dk_ref[0] = kacc[...].astype(dk_ref.dtype)
        dv_ref[0] = vacc[...].astype(dv_ref.dtype)


def _bwd_impl(q, k, v, o, lse, do, *, scale, causal, window, kv_seq_len,
              config, interpret):
    b, h, sq, d = q.shape
    sk, dv_dim = k.shape[2], v.shape[3]
    cfg = config or AttentionConfig()
    bq = min(_ceil_mult(sq, 16), max(16, _ceil_mult(min(cfg.block_q, sq), 16)))
    bk = min(_ceil_mult(sk, 128), max(128, _ceil_mult(min(cfg.block_k, sk), 128)))
    dp_ = _ceil_mult(d, _LANES)
    dvp = _ceil_mult(dv_dim, _LANES)

    # D (delta) = rowsum(do * o) — tiny elementwise+reduce, XLA-fused
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1
    )  # [b, h, sq]

    q_p = pad_to(q.reshape(b * h, sq, d), (None, bq, dp_))
    k_p = pad_to(k.reshape(b * h, sk, d), (None, bk, dp_))
    v_p = pad_to(v.reshape(b * h, sk, dv_dim), (None, bk, dvp))
    do_p = pad_to(do.reshape(b * h, sq, dv_dim), (None, bq, dvp))
    # lse/delta broadcast along LANES, padded rows get +inf lse -> p = 0
    sqp = q_p.shape[1]
    lse_p = jnp.full((b * h, sqp), 1e30, jnp.float32)
    lse_p = lse_p.at[:, :sq].set(lse.reshape(b * h, sq))
    lse_b = jnp.broadcast_to(lse_p[..., None], (b * h, sqp, _LANES))
    delta_p = jnp.zeros((b * h, sqp), jnp.float32)
    delta_p = delta_p.at[:, :sq].set(delta.reshape(b * h, sq))
    delta_b = jnp.broadcast_to(delta_p[..., None], (b * h, sqp, _LANES))
    skp = k_p.shape[1]

    lens = (
        jnp.full((b * h,), sk, jnp.int32)
        if kv_seq_len is None
        else jnp.repeat(jnp.asarray(kv_seq_len, jnp.int32), h)
    )
    q_offset = sk - sq

    qspec = pl.BlockSpec((1, bq, dp_), lambda bh, i, kk, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, dp_), lambda bh, i, kk, *_: (bh, kk, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, bk, dvp), lambda bh, i, kk, *_: (bh, kk, 0), memory_space=pltpu.VMEM)
    dospec = pl.BlockSpec((1, bq, dvp), lambda bh, i, kk, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, bq, _LANES), lambda bh, i, kk, *_: (bh, i, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, window=window,
            n_kv_steps=skp // bk, bq=bq, bk=bk, q_offset=q_offset,
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, dp_), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, sqp // bq, skp // bk),
            in_specs=[qspec, kspec, vspec, dospec, rowspec, rowspec],
            out_specs=pl.BlockSpec(
                (1, bq, dp_), lambda bh, i, kk, *_: (bh, i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((bq, dp_), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(lens, q_p, k_p, v_p, do_p, lse_b, delta_b)

    # dk/dv: swap the roles — grid owns kv blocks, q sequential
    qspec2 = pl.BlockSpec((1, bq, dp_), lambda bh, j, i, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, bk, dp_), lambda bh, j, i, *_: (bh, j, 0), memory_space=pltpu.VMEM)
    vspec2 = pl.BlockSpec((1, bk, dvp), lambda bh, j, i, *_: (bh, j, 0), memory_space=pltpu.VMEM)
    dospec2 = pl.BlockSpec((1, bq, dvp), lambda bh, j, i, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    rowspec2 = pl.BlockSpec((1, bq, _LANES), lambda bh, j, i, *_: (bh, i, 0), memory_space=pltpu.VMEM)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, window=window,
            n_q_steps=sqp // bq, bq=bq, bk=bk, q_offset=q_offset,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skp, dp_), k.dtype),
            jax.ShapeDtypeStruct((b * h, skp, dvp), v.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, skp // bk, sqp // bq),
            in_specs=[qspec2, kspec2, vspec2, dospec2, rowspec2, rowspec2],
            out_specs=[
                pl.BlockSpec((1, bk, dp_), lambda bh, j, i, *_: (bh, j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, dvp), lambda bh, j, i, *_: (bh, j, 0), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((bk, dp_), jnp.float32),
                pltpu.VMEM((bk, dvp), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(lens, q_p, k_p, v_p, do_p, lse_b, delta_b)

    dq = dq[:, :sq, :d].reshape(b, h, sq, d)
    dk = dk[:, :sk, :d].reshape(b, h, sk, d)
    dv = dv[:, :sk, :dv_dim].reshape(b, h, sk, dv_dim)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 7, 8))
def flash_attention_grad(
    q, k, v, scale=None, causal=False, window=None, kv_seq_len=None,
    config=None, interpret=None,
):
    """Differentiable flash attention (training path).

    Same contract as ``flash_attention`` for the (scale, causal, window,
    kv_seq_len, GQA) subset; bias/int8-KV are inference-only for now.
    GQA backward repeats K/V to Hq heads and sums the group gradients.
    """
    return _fwd(q, k, v, scale, causal, window, kv_seq_len, config, interpret)[0]


def _fwd(q, k, v, scale, causal, window, kv_seq_len, config, interpret):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    o, lse = flash_attention(
        q, k, v, scale=scale, causal=causal, window=window,
        kv_seq_len=kv_seq_len, config=config, return_lse=True,
        interpret=interpret,
    )
    return o, (q, k, v, o, lse, kv_seq_len)


def _bwd(scale, causal, window, config, interpret, res, do):
    q, k, v, o, lse, kv_seq_len = res
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if interpret is None:
        interpret = _interpret_default()
    hq, hkv = q.shape[1], k.shape[1]
    group = hq // hkv
    if group > 1:  # GQA: expand K/V, reduce grads over the head group
        k_e = jnp.repeat(k, group, axis=1)
        v_e = jnp.repeat(v, group, axis=1)
    else:
        k_e, v_e = k, v
    dq, dk, dv = _bwd_impl(
        q, k_e, v_e, o, lse, do, scale=scale, causal=causal, window=window,
        kv_seq_len=kv_seq_len, config=config, interpret=interpret,
    )
    if group > 1:
        b, _, sk, d = dk.shape
        dk = dk.reshape(b, hkv, group, sk, d).sum(axis=2)
        dv = dv.reshape(b, hkv, group, sk, dv.shape[-1]).sum(axis=2)
    import numpy as np

    ct_lens = (
        None
        if kv_seq_len is None
        else np.zeros(jnp.shape(kv_seq_len), jax.dtypes.float0)
    )
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), ct_lens


flash_attention_grad.defvjp(
    lambda q, k, v, scale, causal, window, kv_seq_len, config, interpret: _fwd(
        q, k, v, scale, causal, window, kv_seq_len, config, interpret
    ),
    _bwd,
)
