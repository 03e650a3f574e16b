"""Round-5 probe: block-diagonal fused-heads decode attention vs the
per-head loop, at the e2e shape (B=8, GQA 32/8, prefix ~1024, int8 KV).

Usage: python scripts/probe_fused_heads.py
"""
from __future__ import annotations
import sys
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
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

    absmax = jnp.max(jnp.abs(k_f), axis=(2, 3))
    k_scale = jnp.maximum(absmax / 127.0, 1e-8)
    k_q = jnp.clip(jnp.round(k_f / k_scale[:, :, None, None]), -127, 127).astype(jnp.int8)
    absmax = jnp.max(jnp.abs(v_f), axis=(2, 3))
    v_scale = jnp.maximum(absmax / 127.0, 1e-8)
    v_q = jnp.clip(jnp.round(v_f / v_scale[:, :, None, None]), -127, 127).astype(jnp.int8)

    live_bytes = 2 * b * hkv * prefix * d

    # correctness on chip first (fused vs loop, bf16-out tolerance)
    for fused in (False, True):
        pass
    o_loop = decode_attention(q, k_q, v_q, kv_seq_len=lens, k_scale=k_scale,
                              v_scale=v_scale, fused_heads=False)
    o_fuse = decode_attention(q, k_q, v_q, kv_seq_len=lens, k_scale=k_scale,
                              v_scale=v_scale, fused_heads=True)
    diff = float(jnp.max(jnp.abs(o_loop.astype(jnp.float32) - o_fuse.astype(jnp.float32))))
    print(f"on-chip loop-vs-fused max diff: {diff:.3e}")
    assert diff < 2e-2, diff

    def report(name, fn, *args, bytes_accessed):
        try:
            r = benchmark_chained(fn, *args, iters_lo=100, iters_hi=400,
                                  bytes_accessed=float(bytes_accessed))
        except Exception as e:
            print(f"{name:40s}: FAILED {type(e).__name__}: {str(e)[:200]}")
            return None
        print(f"{name:40s}: {r.avg_ms*1e3:7.1f} us  {r.gbps:6.1f} GB/s live",
              flush=True)
        return r

    for fused in (False, True):
        for bk in (512, 1024, 2048):
            def fn(q_, k_, v_):
                return decode_attention(q_, k_, v_, kv_seq_len=lens,
                                        k_scale=k_scale, v_scale=v_scale,
                                        block_k=bk, fused_heads=fused)
            report(f"{'fused' if fused else 'loop '} int8 bk={bk}", fn, q, k_q, v_q,
                   bytes_accessed=live_bytes)

    # fold-in + flat out (the production e2e config)
    kn = k_q[:, :, :1, :]
    vn = v_q[:, :, :1, :]
    for fused in (False, True):
        for bk in (1024, 2048):
            def fn(q_, k_, v_):
                return decode_attention(q_, k_, v_, kv_seq_len=lens,
                                        k_scale=k_scale, v_scale=v_scale,
                                        k_new=kn, v_new=vn, block_k=bk,
                                        fused_heads=fused)
            report(f"{'fused' if fused else 'loop '} +fold-in bk={bk}", fn, q, k_q, v_q,
                   bytes_accessed=live_bytes)

    # bf16 cache
    kb, vb = k_f.astype(jnp.bfloat16), v_f.astype(jnp.bfloat16)
    for fused in (False, True):
        def fn(q_, k_, v_):
            return decode_attention(q_, k_, v_, kv_seq_len=lens, block_k=1024,
                                    fused_heads=fused)
        report(f"{'fused' if fused else 'loop '} bf16 bk=1024", fn, q, kb, vb,
               bytes_accessed=live_bytes * 2)


if __name__ == "__main__":
    main()
