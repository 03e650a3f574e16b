"""Probe: batched-heads decode attention kernel variant.

The production head-grouped kernel loops Python-level over the 8 kv
heads per grid step (16 small dots + per-head softmax chains); this
variant expresses the whole step as 3-D batched ops — one
dot_general with a batch dim over heads + one softmax chain on
[Hkv, rows, page] — to see whether Mosaic schedules it better than the
unrolled loop (the kernel is grid-step-overhead bound, 36.6 us fixed at
bk=512: probe_decode_attn).

Usage: python scripts/probe_decode_attn_batched.py
"""

from __future__ import annotations

import functools
import math
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.attention.paged import decode_attention
from composable_kernel_tpu.ops.gemm.kernel import _ceil_mult, pad_to
from composable_kernel_tpu.utils.timing import benchmark_chained

_NEG_INF = -1e30


def _kernel_batched(table_ref, lens_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                    o_ref, m_scr, l_scr, acc_scr, *, scale, page, n_steps,
                    hkv, rows_pad):
    kk = pl.program_id(1)
    batch = pl.program_id(0)

    @pl.when(kk == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    live = kk * page < lens_ref[0, batch]

    @pl.when(live)
    def _step():
        k_pos = kk * page + jax.lax.broadcasted_iota(
            jnp.int32, (1, rows_pad, page), 2
        )
        mask = k_pos < lens_ref[0, batch]
        q = q_ref[0].reshape(hkv, rows_pad, q_ref.shape[-1])
        k = k_ref[0].astype(q.dtype)          # [hkv, page, D]
        v = v_ref[0].astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale                              # [hkv, rows_pad, page]
        s = s * ks_ref[0, 0].reshape(hkv, 1, 1)
        s = jnp.where(mask, s, _NEG_INF)
        m_prev = m_scr[...].reshape(hkv, rows_pad, -1)
        row_max = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, row_max)
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, :, :1])
        l_prev = l_scr[...].reshape(hkv, rows_pad, -1)
        l_scr[...] = (l_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
                      ).reshape(l_scr.shape)
        m_scr[...] = m_new.reshape(m_scr.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_prev = acc_scr[...].reshape(hkv, rows_pad, -1)
        acc_scr[...] = (acc_prev * corr[:, :, :1] + pv).reshape(acc_scr.shape)

    @pl.when(kk == n_steps - 1)
    def _finish():
        l = l_scr[...][:, :1]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        acc = acc_scr[...].reshape(hkv, rows_pad, -1)
        vsc = vs_ref[0, 0].reshape(hkv, 1, 1)
        o = (acc / l_safe.reshape(hkv, rows_pad, 1)) * vsc
        o_ref[0] = o.reshape(o_ref.shape[1:]).astype(o_ref.dtype)


def decode_attention_batched(q, k, v, lens, k_scale, v_scale, *, block_k=1024):
    b, hq, sq, d = q.shape
    _, hkv, sk, dv = v.shape
    group = hq // hkv
    scale = 1.0 / math.sqrt(d)
    bk = block_k
    dp = _ceil_mult(d, 128)
    rows = group * sq
    rows_pad = _ceil_mult(rows, 8)
    q_r = q.reshape(b, hkv, rows, d)
    q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, rows_pad - rows), (0, dp - d)))
    q_p = q_r.reshape(b, hkv * rows_pad, dp)
    k_p = pad_to(k, (None, None, bk, dp))
    v_p = pad_to(v, (None, None, bk, dp))
    n_steps = k_p.shape[2] // bk
    lens2 = lens.reshape(1, b)
    table = jnp.zeros((b, 1), jnp.int32)

    from composable_kernel_tpu import indexing

    def q_index(batch, kk, *_):
        return (batch, 0, 0)

    def kv_index(batch, kk, table_s, lens_s):
        return (batch, 0, indexing.clamped_block(kk, lens_s[0, batch], bk), 0)

    sc_spec = pl.BlockSpec((1, 1, hkv), lambda batch, kk, *_: (batch, 0, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_batched, scale=scale, page=bk,
                          n_steps=n_steps, hkv=hkv, rows_pad=rows_pad),
        out_shape=jax.ShapeDtypeStruct((b, hkv * rows_pad, dp), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(b, n_steps),
            in_specs=[
                pl.BlockSpec((1, hkv * rows_pad, dp), q_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, bk, dp), kv_index,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, hkv, bk, dp), kv_index,
                             memory_space=pltpu.VMEM),
                sc_spec, sc_spec,
            ],
            out_specs=pl.BlockSpec((1, hkv * rows_pad, dp), q_index,
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((hkv * rows_pad, 128), jnp.float32),
                pltpu.VMEM((hkv * rows_pad, 128), jnp.float32),
                pltpu.VMEM((hkv * rows_pad, dp), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(table, lens2, q_p,
      k_p, v_p,
      k_scale.reshape(-1, 1, hkv), v_scale.reshape(-1, 1, hkv))
    out = out.reshape(b, hkv, rows_pad, dp)[:, :, :rows, :dv]
    return out.reshape(b, hq, sq, dv)


def main():
    b, hq, hkv, s_max, d = 8, 32, 8, 2048, 128
    prefix = 1025
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32).astype(jnp.bfloat16)
    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.integers(-127, 128, (b, hkv, s_max, d)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (b, hkv, s_max, d)), jnp.int8)
    k_scale = jnp.asarray(rng.random((b, hkv)) * 0.02 + 0.01, jnp.float32)
    v_scale = jnp.asarray(rng.random((b, hkv)) * 0.02 + 0.01, jnp.float32)
    lens = jnp.full((b,), prefix, jnp.int32)
    live_bytes = 2 * b * hkv * prefix * d

    want = decode_attention(q, kc, vc, kv_seq_len=lens, k_scale=k_scale,
                            v_scale=v_scale)
    for bk in (512, 1024):
        try:
            got = decode_attention_batched(q, kc, vc, lens, k_scale, v_scale,
                                           block_k=bk)
        except Exception as e:
            print(f"batched bk={bk}: COMPILE FAIL {type(e).__name__}: "
                  f"{str(e)[:140]}")
            continue
        err = float(jnp.linalg.norm((got - want).astype(jnp.float32))
                    / jnp.linalg.norm(want.astype(jnp.float32)))
        r = benchmark_chained(
            lambda q_, k_, v_: decode_attention_batched(
                q_, k_, v_, lens, k_scale, v_scale, block_k=bk),
            q, kc, vc, iters_lo=100, iters_hi=400,
            bytes_accessed=float(live_bytes))
        print(f"batched bk={bk}: {r.avg_ms*1e3:7.1f} us  {r.gbps:6.1f} GB/s "
              f"(rel err {err:.1e})", flush=True)


if __name__ == "__main__":
    main()
