"""Flash-attention backward kernels + custom VJP.

CK analog: ck_tile ``ops/fmha/kernel/fmha_bwd_kernel.hpp`` and its
dq_dk_dv pipelines (``block_fmha_bwd_pipeline_*``): recompute P blockwise
from (Q, K, LSE), then

    D  = rowsum(dO * O)                     (preprocess kernel)
    P  = exp(scale * Q K^T + bias - LSE)
    dV = P~^T dO                            (P~ = dropout-masked P)
    dP = dO V^T
    dBias = P * (keep/(1-r) * dP - D)       (fmha_bwd_kernel.hpp:97,175-182)
    dS = dBias * scale
    dQ = dS K        (one kernel, grid over Q blocks, KV sequential)
    dK = dS^T Q      (second kernel, grid over KV blocks, Q sequential)

Two passes exactly like CK's bwd split: TPU has no cross-program atomics,
so dQ accumulates in the kernel whose grid owns Q blocks and dK/dV in the
one that owns KV blocks. GQA folds the head group into the dK/dV reduce
outside the kernel (jnp sum — XLA fuses).

Dropout backward regenerates the forward's keep-mask from the same
deterministic per-tile seeds (ck_tile ``block_dropout.hpp:25`` reused by the
bwd pipelines) — both kernels rebuild ``seed + (bh*nq + qblk)*nkv + kvblk``
from static grid totals so the bits match the forward bit-for-bit.

Both kernels skip fully-masked (causal / windowed / beyond-varlen-len)
tiles entirely, mirroring the forward's block-level early-out — causal
training visits ~half the tiles (CK: MaskingSpecialization loop bounds).

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
from composable_kernel_tpu.ops.attention.kernel import (
    _LANES,
    _NEG_INF,
    _tile_random_bits,
    flash_attention,
)
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


def _tile_live(q_blk, kv_idx, bq, bk, q_offset, causal, window, kv_len):
    """Scalar block-liveness predicate — same algebra as the fwd kernel's
    early-out (attention/kernel.py:110-122), with the static q_offset the
    bwd path uses in place of the per-batch causal offset."""
    live = kv_idx * bk < kv_len
    if causal:
        live &= kv_idx * bk <= (q_blk + 1) * bq - 1 + q_offset
    if window is not None:
        live &= kv_idx * bk + bk - 1 > q_blk * bq + q_offset - window
    return live


def _dropout_keep(shape, bh, q_blk, kv_idx, *, seed, n_q_blocks, n_kv_steps,
                  rate, interpret_mode):
    """Regenerate the forward's per-tile keep mask (same seed formula as
    _fa_kernel, with the grid totals passed statically because the two bwd
    kernels have different grid layouts)."""
    tile_seed = seed + (bh * n_q_blocks + q_blk) * n_kv_steps + kv_idx
    bits = _tile_random_bits(shape, tile_seed, interpret_mode)
    threshold = jnp.uint32(int(rate * (2**32 - 1)))
    return bits >= threshold


def _bwd_dq_kernel(
    lens_ref, *refs, scale, causal, window, n_kv_steps, bq, bk, q_offset,
    has_bias, dropout_rate, dropout_seed, n_q_blocks, interpret_mode,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    dq_ref = refs[idx]; idx += 1
    dbias_ref = refs[idx] if has_bias else None
    idx += 1 if has_bias else 0
    acc = refs[idx]

    kv_idx = pl.program_id(2)
    q_blk = pl.program_id(1)
    bh = pl.program_id(0)

    @pl.when(kv_idx == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    live = _tile_live(q_blk, kv_idx, bq, bk, q_offset, causal, window,
                      lens_ref[bh])

    @pl.when(live)
    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]      # [bq, LANES] broadcast
        delta = delta_ref[0]  # [bq, LANES]

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            s = s + bias_ref[0].astype(jnp.float32)
        m = _mask(q_blk, kv_idx, bq, bk, q_offset, causal, window, lens_ref[bh])
        p = jnp.where(m, jnp.exp(s - lse[:, :1]), 0.0)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if dropout_rate > 0.0:
            keep = _dropout_keep(
                p.shape, bh, q_blk, kv_idx, seed=dropout_seed,
                n_q_blocks=n_q_blocks, n_kv_steps=n_kv_steps,
                rate=dropout_rate, interpret_mode=interpret_mode,
            )
            dp = jnp.where(keep, dp, 0.0) * (1.0 / (1.0 - dropout_rate))
        dbias = p * (dp - delta[:, :1])
        if has_bias:
            dbias_ref[0] = dbias.astype(dbias_ref.dtype)
        ds = dbias * scale
        acc[...] += jax.lax.dot_general(
            ds.astype(q.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if has_bias:
        @pl.when(jnp.logical_not(live))
        def _dead():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    @pl.when(kv_idx == n_kv_steps - 1)
    def _():
        dq_ref[0] = acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    lens_ref, *refs, scale, causal, window, n_q_steps, bq, bk, q_offset,
    has_bias, dropout_rate, dropout_seed, n_kv_steps, interpret_mode,
):
    idx = 0
    q_ref = refs[idx]; idx += 1
    k_ref = refs[idx]; idx += 1
    v_ref = refs[idx]; idx += 1
    do_ref = refs[idx]; idx += 1
    lse_ref = refs[idx]; idx += 1
    delta_ref = refs[idx]; idx += 1
    if has_bias:
        bias_ref = refs[idx]; idx += 1
    dk_ref = refs[idx]; idx += 1
    dv_ref = refs[idx]; idx += 1
    kacc, vacc = refs[idx], refs[idx + 1]

    q_idx = pl.program_id(2)
    kv_blk = pl.program_id(1)
    bh = pl.program_id(0)

    @pl.when(q_idx == 0)
    def _():
        kacc[...] = jnp.zeros_like(kacc)
        vacc[...] = jnp.zeros_like(vacc)

    live = _tile_live(q_idx, kv_blk, bq, bk, q_offset, causal, window,
                      lens_ref[bh])

    @pl.when(live)
    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0].astype(jnp.float32)
        lse = lse_ref[0]
        delta = delta_ref[0]

        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_bias:
            s = s + bias_ref[0].astype(jnp.float32)
        m = _mask(q_idx, kv_blk, bq, bk, q_offset, causal, window, lens_ref[bh])
        p = jnp.where(m, jnp.exp(s - lse[:, :1]), 0.0)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p_v = p
        if dropout_rate > 0.0:
            keep = _dropout_keep(
                p.shape, bh, q_idx, kv_blk, seed=dropout_seed,
                n_q_blocks=n_q_steps, n_kv_steps=n_kv_steps,
                rate=dropout_rate, interpret_mode=interpret_mode,
            )
            inv = 1.0 / (1.0 - dropout_rate)
            p_v = jnp.where(keep, p, 0.0) * inv  # dV sees dropped P~
            dp = jnp.where(keep, dp, 0.0) * inv
        # dV += P~^T dO
        vacc[...] += jax.lax.dot_general(
            p_v.astype(do_ref.dtype), do.astype(do_ref.dtype),
            (((0,), (0,)), ((), ())),
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
              bias, dropout_rate, dropout_seed, config, interpret):
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
    has_bias = bias is not None
    n_q_blocks = sqp // bq
    n_kv_steps = skp // bk
    if has_bias:
        bias_p = pad_to(
            jnp.asarray(bias).reshape(b * h, sq, sk), (None, bq, bk)
        )

    qspec = pl.BlockSpec((1, bq, dp_), lambda bh, i, kk, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, bk, dp_), lambda bh, i, kk, *_: (bh, kk, 0), memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, bk, dvp), lambda bh, i, kk, *_: (bh, kk, 0), memory_space=pltpu.VMEM)
    dospec = pl.BlockSpec((1, bq, dvp), lambda bh, i, kk, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    rowspec = pl.BlockSpec((1, bq, _LANES), lambda bh, i, kk, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, bq, bk), lambda bh, i, kk, *_: (bh, i, kk), memory_space=pltpu.VMEM)

    in_specs = [qspec, kspec, vspec, dospec, rowspec, rowspec]
    inputs = [q_p, k_p, v_p, do_p, lse_b, delta_b]
    if has_bias:
        in_specs.append(bspec)
        inputs.append(bias_p)

    out_shapes = [jax.ShapeDtypeStruct((b * h, sqp, dp_), q.dtype)]
    out_specs = [pl.BlockSpec(
        (1, bq, dp_), lambda bh, i, kk, *_: (bh, i, 0), memory_space=pltpu.VMEM
    )]
    if has_bias:
        out_shapes.append(jax.ShapeDtypeStruct((b * h, sqp, skp), jnp.float32))
        out_specs.append(bspec)

    outs = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, window=window,
            n_kv_steps=n_kv_steps, bq=bq, bk=bk, q_offset=q_offset,
            has_bias=has_bias, dropout_rate=dropout_rate,
            dropout_seed=dropout_seed, n_q_blocks=n_q_blocks,
            interpret_mode=interpret,
        ),
        out_shape=out_shapes,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n_q_blocks, n_kv_steps),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((bq, dp_), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(lens, *inputs)
    dq = outs[0]
    dbias = outs[1][:, :sq, :sk].reshape(b, h, sq, sk) if has_bias else None

    # dk/dv: swap the roles — grid owns kv blocks, q sequential
    qspec2 = pl.BlockSpec((1, bq, dp_), lambda bh, j, i, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    kspec2 = pl.BlockSpec((1, bk, dp_), lambda bh, j, i, *_: (bh, j, 0), memory_space=pltpu.VMEM)
    vspec2 = pl.BlockSpec((1, bk, dvp), lambda bh, j, i, *_: (bh, j, 0), memory_space=pltpu.VMEM)
    dospec2 = pl.BlockSpec((1, bq, dvp), lambda bh, j, i, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    rowspec2 = pl.BlockSpec((1, bq, _LANES), lambda bh, j, i, *_: (bh, i, 0), memory_space=pltpu.VMEM)
    bspec2 = pl.BlockSpec((1, bq, bk), lambda bh, j, i, *_: (bh, i, j), memory_space=pltpu.VMEM)

    in_specs2 = [qspec2, kspec2, vspec2, dospec2, rowspec2, rowspec2]
    if has_bias:
        in_specs2.append(bspec2)

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, window=window,
            n_q_steps=n_q_blocks, bq=bq, bk=bk, q_offset=q_offset,
            has_bias=has_bias, dropout_rate=dropout_rate,
            dropout_seed=dropout_seed, n_kv_steps=n_kv_steps,
            interpret_mode=interpret,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skp, dp_), k.dtype),
            jax.ShapeDtypeStruct((b * h, skp, dvp), v.dtype),
        ],
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, skp // bk, n_q_blocks),
            in_specs=in_specs2,
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
    )(lens, *inputs)

    dq = dq[:, :sq, :d].reshape(b, h, sq, d)
    dk = dk[:, :sk, :d].reshape(b, h, sk, d)
    dv = dv[:, :sk, :dv_dim].reshape(b, h, sk, dv_dim)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 8, 9, 10, 11))
def flash_attention_grad(
    q, k, v, bias=None, scale=None, causal=False, window=None,
    kv_seq_len=None, dropout_rate=0.0, dropout_seed=0, config=None,
    interpret=None,
):
    """Differentiable flash attention (training path).

    Same contract as ``flash_attention`` for the (scale, causal, window,
    kv_seq_len, bias, dropout, GQA) subset; int8-KV stays inference-only.
    GQA backward repeats K/V to Hq heads and sums the group gradients.
    ``bias`` gradients (dbias) are emitted per CK fmha_bwd_kernel.hpp:97;
    dropout backward regenerates the forward keep-mask from the same
    deterministic per-tile seeds (block_dropout.hpp:25 analog).
    """
    return _fwd(q, k, v, bias, scale, causal, window, kv_seq_len,
                dropout_rate, dropout_seed, config, interpret)[0]


def _fwd(q, k, v, bias, scale, causal, window, kv_seq_len, dropout_rate,
         dropout_seed, config, interpret):
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    o, lse = flash_attention(
        q, k, v, scale=scale, causal=causal, window=window, bias=bias,
        kv_seq_len=kv_seq_len, dropout_rate=dropout_rate,
        dropout_seed=dropout_seed, config=config, return_lse=True,
        interpret=interpret,
    )
    return o, (q, k, v, bias, o, lse, kv_seq_len)


def _bwd(scale, causal, window, dropout_rate, dropout_seed, config,
         interpret, res, do):
    # nondiff_argnums order: (scale, causal, window, dropout_rate,
    # dropout_seed, config, interpret); diff args: q, k, v, bias, kv_seq_len
    q, k, v, bias, o, lse, kv_seq_len = res
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
    dq, dk, dv, dbias = _bwd_impl(
        q, k_e, v_e, o, lse, do, scale=scale, causal=causal, window=window,
        kv_seq_len=kv_seq_len, bias=bias, dropout_rate=dropout_rate,
        dropout_seed=dropout_seed, config=config, interpret=interpret,
    )
    if group > 1:
        b, _, sk, d = dk.shape
        dk = dk.reshape(b, hkv, group, sk, d).sum(axis=2)
        dv = dv.reshape(b, hkv, group, sk, dv.shape[-1]).sum(axis=2)
    import numpy as np

    ct_bias = None if bias is None else dbias.astype(bias.dtype)
    ct_lens = (
        None
        if kv_seq_len is None
        else np.zeros(jnp.shape(kv_seq_len), jax.dtypes.float0)
    )
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), ct_bias, ct_lens


flash_attention_grad.defvjp(
    lambda q, k, v, bias, scale, causal, window, kv_seq_len, dropout_rate, dropout_seed, config, interpret: _fwd(
        q, k, v, bias, scale, causal, window, kv_seq_len, dropout_rate,
        dropout_seed, config, interpret
    ),
    _bwd,
)
