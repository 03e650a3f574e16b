"""Isolated decode-attention probe (round 4).

The e2e budget probe puts flash_decode at 73 us/layer (B=8, prefix ~1024,
int8 KV, GQA 32/8) = 2.35 ms/step vs a ~0.8 ms DMA floor. This sweeps the
dense head-grouped kernel's levers at the exact e2e shape to find where
the 2.5x goes: block_k, cache dtype (isolates the int8->bf16 convert
cost), and sq padding (rows_pad=8 vs rows=4: half the in-kernel compute
is padding rows).

Usage: python scripts/probe_decode_attn.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from composable_kernel_tpu.ops.attention import flash_decode
from composable_kernel_tpu.ops.attention.paged import decode_attention
from composable_kernel_tpu.utils.timing import benchmark_chained


def main():
    b, hq, hkv, s_max, d = 8, 32, 8, 2048, 128
    prefix = 1025
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, hq, 1, d), jnp.float32).astype(jnp.bfloat16)
    k_f = jax.random.normal(ks[1], (b, hkv, s_max, d), jnp.float32)
    v_f = jax.random.normal(ks[2], (b, hkv, s_max, d), jnp.float32)
    lens = jnp.full((b,), prefix, jnp.int32)

    # int8 cache with per-(b,h) scales
    absmax = jnp.max(jnp.abs(k_f), axis=(2, 3))
    k_scale = jnp.maximum(absmax / 127.0, 1e-8)
    k_q = jnp.clip(jnp.round(k_f / k_scale[:, :, None, None]), -127, 127).astype(jnp.int8)
    absmax = jnp.max(jnp.abs(v_f), axis=(2, 3))
    v_scale = jnp.maximum(absmax / 127.0, 1e-8)
    v_q = jnp.clip(jnp.round(v_f / v_scale[:, :, None, None]), -127, 127).astype(jnp.int8)
    k_bf, v_bf = k_f.astype(jnp.bfloat16), v_f.astype(jnp.bfloat16)

    live_bytes_i8 = 2 * b * hkv * prefix * d  # K+V int8
    live_bytes_bf = live_bytes_i8 * 2

    def report(name, fn, *args, bytes_accessed):
        try:
            r = benchmark_chained(fn, *args, iters_lo=100, iters_hi=400,
                                  bytes_accessed=float(bytes_accessed))
        except Exception as e:
            print(f"{name:36s}: FAILED {type(e).__name__}: {str(e)[:120]}")
            return
        print(f"{name:36s}: {r.avg_ms*1e3:7.1f} us  {r.gbps:6.1f} GB/s live",
              flush=True)

    for bk in (256, 512, 1024, 2048):
        def fn(q_, k_, v_):
            return decode_attention(q_, k_, v_, kv_seq_len=lens,
                                    k_scale=k_scale, v_scale=v_scale,
                                    block_k=bk)
        report(f"int8 bk={bk}", fn, q, k_q, v_q,
               bytes_accessed=live_bytes_i8)

    for bk in (512, 1024):
        def fn(q_, k_, v_):
            return decode_attention(q_, k_, v_, kv_seq_len=lens, block_k=bk)
        report(f"bf16 bk={bk}", fn, q, k_bf, v_bf,
               bytes_accessed=live_bytes_bf)

    # fixed overhead: lens=32 (one live block, minimal DMA+compute)
    lens1 = jnp.full((b,), 32, jnp.int32)

    def fn(q_, k_, v_):
        return decode_attention(q_, k_, v_, kv_seq_len=lens1,
                                k_scale=k_scale, v_scale=v_scale, block_k=512)
    report("int8 lens=32 (overhead)", fn, q, k_q, v_q,
           bytes_accessed=2 * b * hkv * 32 * d)

    # glue-only: the q pad/reshape + out slice around the kernel
    def glue(q_):
        rows_pad = 8
        q_r = q_.reshape(b, hkv, 4, d)
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, rows_pad - 4), (0, 0)))
        q_p = q_r.reshape(b, hkv * rows_pad, d)
        out = q_p.reshape(b, hkv, rows_pad, d)[:, :, :4, :]
        return out.reshape(b, hq, 1, d)
    report("glue only (pad+reshape)", glue, q, bytes_accessed=0)

    # flash_decode dispatcher (what the e2e layer calls)
    def fn(q_, k_, v_):
        return flash_decode(q_, k_, v_, kv_seq_len=lens,
                            k_scale=k_scale, v_scale=v_scale)
    report("flash_decode dispatch (e2e path)", fn, q, k_q, v_q,
           bytes_accessed=live_bytes_i8)

    # deferred-append fold-in (k_new/v_new): marginal cost vs plain
    kn = k_q[:, :, :1, :]
    vn = v_q[:, :, :1, :]
    for bk in (512, 1024):
        def fn(q_, k_, v_):
            return decode_attention(q_, k_, v_, kv_seq_len=lens,
                                    k_scale=k_scale, v_scale=v_scale,
                                    k_new=kn, v_new=vn, block_k=bk)
        report(f"int8 bk={bk} +fold-in", fn, q, k_q, v_q,
               bytes_accessed=live_bytes_i8)


if __name__ == "__main__":
    main()
