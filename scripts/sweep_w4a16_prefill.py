"""Autotune sweep for the W4A16 headline shape (VERDICT round-2 item 1b).

M=3840 divides exactly by 768/640/960/1280 but NOT 512 — the round-1 best
config (512,1024,1024) pads M to 4096 and throws away 6.7% of the MXU work.
Sweep exact-fit block_m values x aspect ratios x K depth on the real chip.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.ops.gemm.config import GemmConfig
from composable_kernel_tpu.ops.quant import dequant_gemm
from composable_kernel_tpu.reference.quant import ref_quantize_group
from composable_kernel_tpu.utils.timing import benchmark_chained


def main():
    assert jax.default_backend() == "tpu"
    m, n, k, g = 3840, 4096, 4096, 128
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    w_q, scales = ref_quantize_group(w, group_size=g, bits=4)
    packed = dtypes.pack_int4(w_q, axis=0)
    flops = 2.0 * m * n * k

    cands = [
        (512, 1024, 1024),   # round-1 best: 160.6 TF
        (768, 1024, 1024),
        (640, 1024, 1024),
        (960, 1024, 1024),
        (1280, 1024, 512),
        (768, 2048, 512),
        (640, 2048, 512),
        (768, 512, 1024),
        (768, 1024, 512),
        (384, 1024, 1024),
        (960, 512, 1024),
        (768, 2048, 1024),
        (1280, 512, 1024),
        (960, 1024, 512),
    ]
    results = []
    for bm, bn, bk in cands:
        cfg = GemmConfig(bm, bn, bk)

        def fn(a_, b_, s_):
            return dequant_gemm(a_, b_, s_, group_size=g, packed_int4=True,
                                config=cfg, interpret=False)

        try:
            r = benchmark_chained(fn, a, packed, scales, iters_lo=20,
                                  iters_hi=120, flops=flops)
        except Exception as e:
            print(f"{cfg.name()}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            continue
        results.append((r.tflops, cfg))
        print(f"{cfg.name()}: {r.tflops:.1f} TFlops ({r.avg_ms:.3f} ms)",
              flush=True)

    results.sort(reverse=True, key=lambda t: t[0])
    print("\ntop 3:")
    for tf, cfg in results[:3]:
        print(f"  {cfg.name()}: {tf:.1f} TF = {100*tf/197:.1f}% of MXU peak")


if __name__ == "__main__":
    main()
