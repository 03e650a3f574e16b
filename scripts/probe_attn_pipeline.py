"""Probe: skewed software-pipelined flash attention (MXU/VPU overlap).

Hypothesis: the fwd kernel sits at ~54% of MXU peak because within one KV
step the chain is serial — QK^T (MXU) -> exp/rescale (VPU) -> PV (MXU) —
and on v5e the softmax VPU time per tile is comparable to the two dots'
MXU time, so the units ping-pong. Skewing by one KV step makes step j's
QK^T independent of step j-1's softmax+PV: Mosaic can issue the dot and
the VPU chain in parallel (FA3's GEMM/softmax overlap idea, re-shaped for
the TPU's single-core MXU+VPU issue model; CK analog: the ping-pong
scheduler of block_fmha_pipeline_qr_ks_vs_async).

Mechanics: grid gets one extra KV step; raw scores land in a ping-pong
scratch s_scr[2, bq, bk] (stage A writes parity kv%2, stage B consumes
parity (kv-1)%2); the V BlockSpec index map lags K's by one step.

Run on the real chip: python scripts/probe_attn_pipeline.py
"""

import math
import sys

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.attention import flash_attention
from composable_kernel_tpu.ops.gemm.kernel import _ceil_mult, pad_to
from composable_kernel_tpu.utils.timing import benchmark_chained

_NEG_INF = -1e30
_LANES = 128


def _skew_kernel(q_ref, k_ref, v_ref, o_ref, s_scr, m_scr, l_scr, acc_scr,
                 *, scale, causal, n_kv, bq, bk, off):
    qb = pl.program_id(1)
    kv = pl.program_id(2)  # 0 .. n_kv inclusive (one skew step)

    @pl.when(kv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # ---- stage A: QK^T for block kv (lands in the parity buffer) ----
    live_a = kv < n_kv
    if causal:
        live_a &= kv * bk <= qb * bq + bq - 1 + off

    @pl.when(live_a)
    def _dot():
        q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_scr[kv % 2] = s.astype(s_scr.dtype)

    # ---- stage B: softmax + PV for block kv-1 (parity (kv-1)%2) ----
    live_b = kv > 0
    if causal:
        live_b &= (kv - 1) * bk <= qb * bq + bq - 1 + off

    jv = kv - 1
    interior = jnp.bool_(True)
    if causal:
        interior = (jv * bk + bk - 1) <= (qb * bq + off)

    def _soft(masked: bool):
        s = s_scr[(kv - 1) % 2].astype(jnp.float32)
        if masked:
            q_pos = qb * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0) + off
            k_pos = jv * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
            s = jnp.where(k_pos <= q_pos, s, _NEG_INF)
        m_prev = m_scr[...]
        row_max = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, row_max)
        corr = jnp.exp(m_prev - m_new)
        m_scr[...] = m_new
        p16 = jnp.exp(s - m_new[:, :1]).astype(v_ref.dtype)
        l_scr[...] = l_scr[...] * corr + jnp.sum(
            p16.astype(jnp.float32), axis=-1, keepdims=True
        )
        pv = jax.lax.dot_general(
            p16, v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * corr[:, :1] + pv

    @pl.when(live_b & interior)
    def _plain():
        _soft(False)

    @pl.when(live_b & jnp.logical_not(interior))
    def _masked():
        _soft(True)

    @pl.when(kv == n_kv)
    def _finish():
        l = l_scr[...][:, :1]
        l_safe = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc_scr[...] / l_safe).astype(o_ref.dtype)


def skewed_flash(q, k, v, *, causal=True, block_q=1024, block_k=1024,
                 s_dtype=jnp.float32):
    b, hq, sq, d = q.shape
    _, hkv, sk, dv = v.shape
    group = hq // hkv
    scale = 1.0 / math.sqrt(d)
    bq = min(_ceil_mult(sq, 16), max(16, _ceil_mult(min(block_q, sq), 16)))
    bk = min(_ceil_mult(sk, 128), max(128, _ceil_mult(min(block_k, sk), 128)))
    dp = _ceil_mult(d, _LANES)
    dvp = _ceil_mult(dv, _LANES)
    q_p = pad_to(q.reshape(b * hq, sq, d), (None, bq, dp))
    k_p = pad_to(k.reshape(b * hkv, sk, d), (None, bk, dp))
    v_p = pad_to(v.reshape(b * hkv, sk, dv), (None, bk, dvp))
    n_kv = k_p.shape[1] // bk
    off = sk - sq

    def q_index(bh, i, kk):
        return (bh, i, 0)

    def k_index(bh, i, kk):
        return ((bh // hq) * hkv + (bh % hq) // group,
                jnp.minimum(kk, n_kv - 1), 0)

    def v_index(bh, i, kk):
        return ((bh // hq) * hkv + (bh % hq) // group,
                jnp.maximum(kk - 1, 0), 0)

    grid = (b * hq, q_p.shape[1] // bq, n_kv + 1)
    kernel = functools.partial(
        _skew_kernel, scale=scale, causal=causal, n_kv=n_kv,
        bq=bq, bk=bk, off=off,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * hq, q_p.shape[1], dvp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), k_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dvp), v_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dvp), q_index, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, bq, bk), s_dtype),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, dvp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the ping-pong s scratch (2*bq*bk f32) busts the 16 MB default
            # scoped-vmem at 1024 blocks; v5e VMEM is 128 MB
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(q_p, k_p, v_p)
    return out[:, :sq, :dv].reshape(b, hq, sq, dv)


def main():
    import os

    os.environ["CKT_INTERPRET"] = "0"
    b, hq, hkv, s, d = 2, 32, 8, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, hq, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)

    want = np.asarray(flash_attention(q, k, v, causal=True), np.float32)
    flops = 4.0 * b * hq * s * s * d * 0.5

    for blocks in [(1024, 1024), (512, 1024), (1024, 512), (512, 512),
                   (2048, 512), (512, 2048)]:
        bq, bk = blocks
        got = np.asarray(
            skewed_flash(q, k, v, causal=True, block_q=bq, block_k=bk),
            np.float32,
        )
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 2e-2, (blocks, rel)
        r = benchmark_chained(
            lambda q_: skewed_flash(q_, k, v, causal=True, block_q=bq,
                                    block_k=bk),
            q, flops=flops,
        )
        print(f"skewed {blocks}: {r.avg_ms:.3f} ms "
              f"{r.tflops:.1f} TF-eff  (rel {rel:.2e})")

    r = benchmark_chained(
        lambda q_: flash_attention(q_, k, v, causal=True), q, flops=flops
    )
    print(f"baseline flash_attention: {r.avg_ms:.3f} ms {r.tflops:.1f} TF-eff")





# ---- decomposition probe: MXU-only vs softmax-only floors ---------------
# Replaces the skew experiment's conclusion with a roofline statement:
# time(dot-only) + time(softmax-only) vs time(full) tells whether Mosaic
# overlaps MXU and VPU at all, and what an ideal overlap could recover.

def _floor_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale, n_kv, bq, bk, off, mode):
    qb = pl.program_id(1)
    kv = pl.program_id(2)

    @pl.when(kv == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    live = kv * bk <= qb * bq + bq - 1 + off

    @pl.when(live)
    def _step():
        q = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
        if mode == "dots":
            # both dots, softmax replaced by a raw convert (keeps the
            # dependency chain through s but no max/exp/sum VPU passes)
            s = jax.lax.dot_general(q, k_ref[0], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            p16 = s.astype(v_ref.dtype)
            pv = jax.lax.dot_general(p16, v_ref[0], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            acc_scr[...] += pv
        else:
            # softmax chain only: s comes from a cheap broadcast of one K
            # row (no MXU dot), full max/exp/sum/rescale VPU passes
            s = q[:, :1] * k_ref[0][:, :1].reshape(1, -1)  # [bq, bk] outer
            m_prev = m_scr[...]
            row_max = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, row_max)
            corr = jnp.exp(m_prev - m_new)
            m_scr[...] = m_new
            p16 = jnp.exp(s - m_new[:, :1]).astype(v_ref.dtype)
            l_scr[...] = l_scr[...] * corr + jnp.sum(
                p16.astype(jnp.float32), axis=-1, keepdims=True)
            acc_scr[...] = acc_scr[...] * corr[:, :1] + p16[:, :128]

    @pl.when(kv == n_kv - 1)
    def _finish():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def floor_probe(q, k, v, mode, block=1024):
    b, hq, sq, d = q.shape
    _, hkv, sk, dv = v.shape
    group = hq // hkv
    scale = 1.0 / math.sqrt(d)
    bq = bk = block
    dp = dvp = _ceil_mult(d, _LANES)
    q_p = pad_to(q.reshape(b * hq, sq, d), (None, bq, dp))
    k_p = pad_to(k.reshape(b * hkv, sk, d), (None, bk, dp))
    v_p = pad_to(v.reshape(b * hkv, sk, dv), (None, bk, dvp))
    n_kv = k_p.shape[1] // bk

    def q_index(bh, i, kk):
        return (bh, i, 0)

    def kv_index(bh, i, kk):
        return ((bh // hq) * hkv + (bh % hq) // group, kk, 0)

    kernel = functools.partial(_floor_kernel, scale=scale, n_kv=n_kv,
                               bq=bq, bk=bk, off=sk - sq, mode=mode)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * hq, q_p.shape[1], dvp), q.dtype),
        grid=(b * hq, q_p.shape[1] // bq, n_kv),
        in_specs=[
            pl.BlockSpec((1, bq, dp), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dvp), kv_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dvp), q_index, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, dvp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q_p, k_p, v_p)
    return out[:, :sq, :dv].reshape(b, hq, sq, dv)


def main_floors():
    b, hq, hkv, s, d = 2, 32, 8, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, hq, s, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, s, d), jnp.float32).astype(jnp.bfloat16)
    flops = 4.0 * b * hq * s * s * d * 0.5
    for mode in ("dots", "softmax"):
        r = benchmark_chained(
            lambda q_: floor_probe(q_, k, v, mode), q, flops=flops)
        print(f"floor[{mode}]: {r.avg_ms:.3f} ms ({r.tflops:.1f} TF-eff-scale)")
    r = benchmark_chained(
        lambda q_: flash_attention(q_, k, v, causal=True), q, flops=flops)
    print(f"full kernel: {r.avg_ms:.3f} ms {r.tflops:.1f} TF-eff")


def main_round2():
    b, hq, hkv, s_, d = 2, 32, 8, 4096, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, hq, s_, d), jnp.float32).astype(jnp.bfloat16)
    k = jax.random.normal(ks[1], (b, hkv, s_, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(ks[2], (b, hkv, s_, d), jnp.float32).astype(jnp.bfloat16)
    want = np.asarray(flash_attention(q, k, v, causal=True), np.float32)
    flops = 4.0 * b * hq * s_ * s_ * d * 0.5
    for blocks in [(1024, 1024), (512, 1024), (1024, 512)]:
        bq, bk = blocks
        got = np.asarray(skewed_flash(q, k, v, causal=True, block_q=bq,
                                      block_k=bk, s_dtype=jnp.bfloat16),
                         np.float32)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        r = benchmark_chained(
            lambda q_: skewed_flash(q_, k, v, causal=True, block_q=bq,
                                    block_k=bk, s_dtype=jnp.bfloat16),
            q, flops=flops)
        print(f"skew-bf16s {blocks}: {r.avg_ms:.3f} ms {r.tflops:.1f} TF-eff"
              f" (rel {rel:.2e})")
    from composable_kernel_tpu.ops.attention.config import AttentionConfig
    for blocks in [(1024, 2048), (2048, 1024), (1024, 4096), (2048, 2048),
                   (512, 4096)]:
        bq, bk = blocks
        cfgb = AttentionConfig(block_q=bq, block_k=bk)
        try:
            r = benchmark_chained(
                lambda q_: flash_attention(q_, k, v, causal=True, config=cfgb),
                q, flops=flops)
            print(f"baseline {blocks}: {r.avg_ms:.3f} ms {r.tflops:.1f} TF-eff")
        except Exception as e:
            print(f"baseline {blocks}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    import sys as _sys
    if "--floors" in _sys.argv:
        main_floors()
    elif "--round2" in _sys.argv:
        main_round2()
    else:
        main()
