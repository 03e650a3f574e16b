"""Round-2 queued TPU drive (see TODO.md): run on the real chip.

Covers, in one serialized on-chip session:
  A. W8A8 GEMM exactness (int64 reference) at decode + odd shapes.
  B. W8A8 GEMM perf: decode weight-stream GB/s + prefill TOPs rows for
     docs/performance.md.
  C. Speculative-verify attention (causal-chunk Sq=4): on-chip parity vs
     the jnp reference + timing for the dense and paged kernels, against
     the per-token (4x Sq=1) alternative the engine used before.
  D. Quantized-MoE decode smoke (w8a16 + w4a8 expert stacks on chip).

Reference analog: profiler/src/profile_gemm*.cpp one-shot verification +
timing runs (StreamConfig protocol); timing here is benchmark_chained per
docs/performance.md's tunnel discipline.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from composable_kernel_tpu.ops.quant import w8a8_gemm
from composable_kernel_tpu.ops.quant.w4a8 import quantize_act_token
from composable_kernel_tpu.ops.attention.paged import (
    decode_attention,
    paged_flash_decode,
)
from composable_kernel_tpu.utils.timing import benchmark_chained
from composable_kernel_tpu.models import llama

OK = []


def report(name, ok, detail=""):
    OK.append(ok)
    print(f"[{'PASS' if ok else 'FAIL'}] {name}  {detail}", flush=True)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(dtype)


# ---------------------------------------------------------------- A: W8A8
def w8a8_exactness():
    k0 = jax.random.PRNGKey(0)
    for (m, n, k) in [(8, 14336, 4096), (16, 384, 512), (1, 11008, 4096)]:
        a = _rand(jax.random.fold_in(k0, m + n), (m, k)) * 0.5
        w = _rand(jax.random.fold_in(k0, n + k), (k, n)) * 0.1
        a_q, a_s = quantize_act_token(a)
        absmax = jnp.max(jnp.abs(w), axis=0)
        w_s = jnp.maximum(absmax / 127.0, 1e-8)
        w_q = jnp.clip(jnp.round(w / w_s), -127, 127).astype(jnp.int8)
        got = np.asarray(w8a8_gemm(a_q, a_s, w_q, w_s.astype(jnp.float32),
                                   out_dtype=jnp.float32))
        want = (np.asarray(a_q, np.int64) @ np.asarray(w_q, np.int64)
                ).astype(np.float64)
        want = want * np.asarray(w_s, np.float64)[None, :]
        want = want * np.asarray(a_s, np.float64)
        rel = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-9)
        report(f"w8a8 exact {m}x{n}x{k}", rel < 1e-5, f"rel={rel:.2e}")


def w8a8_perf():
    k0 = jax.random.PRNGKey(1)
    # decode: weight stream = K*N int8 bytes (+ scales, negligible)
    for (m, n, k) in [(8, 14336, 4096), (8, 11008, 4096), (32, 14336, 4096)]:
        a = _rand(jax.random.fold_in(k0, n + m), (m, k)) * 0.5
        a_q, a_s = quantize_act_token(a)
        w_q = jax.random.randint(jax.random.fold_in(k0, n), (k, n), -127, 127,
                                 jnp.int8)
        w_s = jnp.abs(_rand(jax.random.fold_in(k0, n + 1), (n,))) * 0.01
        r = benchmark_chained(
            lambda aq: w8a8_gemm(aq, a_s, w_q, w_s), a_q,
            bytes_accessed=float(k * n),
        )
        print(f"w8a8 decode M={m} N={n} K={k}: {r.avg_ms:.3f} ms, "
              f"{r.gbps:.0f} GB/s weight stream", flush=True)
    # prefill: int8 MXU TOPs
    for (m, n, k) in [(2048, 4096, 4096), (2048, 14336, 4096)]:
        a = _rand(jax.random.fold_in(k0, m), (m, k)) * 0.5
        a_q, a_s = quantize_act_token(a)
        w_q = jax.random.randint(jax.random.fold_in(k0, m + 1), (k, n), -127,
                                 127, jnp.int8)
        w_s = jnp.abs(_rand(jax.random.fold_in(k0, m + 2), (n,))) * 0.01
        r = benchmark_chained(
            lambda aq: w8a8_gemm(aq, a_s, w_q, w_s), a_q,
            flops=2.0 * m * n * k,
        )
        print(f"w8a8 prefill {m}x{n}x{k}: {r.avg_ms:.3f} ms, "
              f"{r.tflops:.1f} TOPs", flush=True)


# ------------------------------------------------- C: verify attention
def _ref_causal_chunk(q, ks, vs, lens, sq):
    b, hq, _, d = q.shape
    hkv = ks.shape[1]
    g = hq // hkv
    outs = []
    for i in range(b):
        L = int(lens[i])
        k_i = np.repeat(np.asarray(ks[i, :, :L], np.float32), g, axis=0)
        v_i = np.repeat(np.asarray(vs[i, :, :L], np.float32), g, axis=0)
        s = np.einsum("hqd,hkd->hqk", np.asarray(q[i], np.float32), k_i)
        s = s / np.sqrt(d)
        pos = L - sq + np.arange(sq)
        mask = np.arange(L)[None, :] <= pos[:, None]
        s = np.where(mask[None], s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        outs.append(np.einsum("hqk,hkd->hqd", p, v_i))
    return np.stack(outs)


def verify_attention():
    b, hq, hkv, d, s_max, sq = 8, 32, 8, 128, 2048, 4
    lens = np.array([1536, 1024, 1536, 768, 1536, 1280, 1536, 512], np.int32)
    k0 = jax.random.PRNGKey(2)
    q = _rand(jax.random.fold_in(k0, 0), (b, hq, sq, d), jnp.bfloat16)
    ks = _rand(jax.random.fold_in(k0, 1), (b, hkv, s_max, d), jnp.bfloat16)
    vs = _rand(jax.random.fold_in(k0, 2), (b, hkv, s_max, d), jnp.bfloat16)

    got = decode_attention(q, ks, vs, kv_seq_len=jnp.asarray(lens),
                           causal=True, out_dtype=jnp.float32)
    want = _ref_causal_chunk(q, ks, vs, lens, sq)
    rel = (np.linalg.norm(np.asarray(got) - want) /
           np.linalg.norm(want))
    report("verify attention dense causal-chunk on chip", rel < 2e-2,
           f"rel={rel:.2e}")

    # paged layout of the same contents
    page = 128
    n_pages = b * (s_max // page)
    k_pool = ks.reshape(b, hkv, s_max // page, page, d)
    k_pool = jnp.moveaxis(k_pool, 2, 1).reshape(n_pages, hkv, page, d)
    v_pool = vs.reshape(b, hkv, s_max // page, page, d)
    v_pool = jnp.moveaxis(v_pool, 2, 1).reshape(n_pages, hkv, page, d)
    table = jnp.asarray(
        np.arange(n_pages, dtype=np.int32).reshape(b, s_max // page))
    got_p = paged_flash_decode(q, k_pool, v_pool, table, jnp.asarray(lens),
                               causal=True, out_dtype=jnp.float32)
    rel_p = (np.linalg.norm(np.asarray(got_p) - want) /
             np.linalg.norm(want))
    report("verify attention paged causal-chunk on chip", rel_p < 2e-2,
           f"rel={rel_p:.2e}")

    live = float(lens.sum()) * hkv * d * 2 * 2  # bf16 K+V
    r = benchmark_chained(
        lambda qq: decode_attention(qq, ks, vs,
                                    kv_seq_len=jnp.asarray(lens),
                                    causal=True),
        q, bytes_accessed=live)
    print(f"verify dense Sq=4: {r.avg_ms:.3f} ms, {r.gbps:.0f} GB/s live-KV",
          flush=True)
    r1 = benchmark_chained(
        lambda qq: decode_attention(qq, ks, vs,
                                    kv_seq_len=jnp.asarray(lens)),
        q[:, :, :1], bytes_accessed=live)
    print(f"  per-token Sq=1 (x4 = old verify cost): {r1.avg_ms:.3f} ms "
          f"-> speedup {4 * r1.avg_ms / r.avg_ms:.2f}x", flush=True)
    rp = benchmark_chained(
        lambda qq: paged_flash_decode(qq, k_pool, v_pool, table,
                                      jnp.asarray(lens), causal=True),
        q, bytes_accessed=live)
    print(f"verify paged Sq=4: {rp.avg_ms:.3f} ms, {rp.gbps:.0f} GB/s "
          f"live-KV", flush=True)


# --------------------------------------------------------- D: MoE smoke
def moe_decode_smoke():
    for quant in ("int8", "w4a8"):
        cfg = llama.tiny_config(quant=quant, n_experts=4, top_k_experts=2)
        params = llama.init_weights(cfg, jax.random.PRNGKey(3))
        qp = llama.quantize_weights(params, cfg)
        toks = jax.random.randint(jax.random.PRNGKey(4), (2, 16), 0,
                                  cfg.vocab_size)
        _, seeds = llama.forward(qp, toks, cfg, return_cache=True)
        cache = llama.seed_kv_cache(llama.init_kv_cache(cfg, 2), seeds, cfg)
        logits, _ = llama.decode_step_batched(
            qp, cache, toks[:, -1:], jnp.asarray([16, 16], jnp.int32), cfg)
        fin = bool(jnp.isfinite(logits.astype(jnp.float32)).all())
        report(f"moe decode smoke quant={quant}", fin,
               f"logits[0,0,:3]={np.asarray(logits, np.float32)[0, 0, :3]}")


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    print("== A: W8A8 exactness ==", flush=True)
    w8a8_exactness()
    print("== B: W8A8 perf ==", flush=True)
    w8a8_perf()
    print("== C: speculative-verify attention ==", flush=True)
    verify_attention()
    print("== D: MoE decode smoke ==", flush=True)
    moe_decode_smoke()
    print(f"== drive done: {sum(OK)}/{len(OK)} checks passed ==", flush=True)
    sys.exit(0 if all(OK) else 1)


if __name__ == "__main__":
    main()
