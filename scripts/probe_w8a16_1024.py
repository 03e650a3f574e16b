"""Config-1 sweep: W8A16 per-channel dequant GEMM at M=N=K=1024.

BENCH_r03: 157 TF = 80% of the 197 TF bf16 MXU peak; the north-star bar
is >=90% SoL. At 13.7 us/call the kernel is near the launch/pipeline
floor — sweep block shapes (incl. whole-array single-step instances) and
vmem raises to find the 12.2-us (90%) instance.

Usage: python scripts/probe_w8a16_1024.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from composable_kernel_tpu.ops.gemm.config import GemmConfig
from composable_kernel_tpu.ops.quant import dequant_gemm
from composable_kernel_tpu.reference.quant import (
    ref_dequant_gemm,
    ref_quantize_per_channel,
)
from composable_kernel_tpu.utils.check_err import check_err
from composable_kernel_tpu.utils.timing import benchmark_chained


def main():
    m = n = k = 1024
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32).astype(
        jnp.bfloat16
    )
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    w_q, scales = ref_quantize_per_channel(w, bits=8)
    flops = 2.0 * m * n * k

    candidates = [
        None,  # heuristic default (the 157 TF baseline)
        GemmConfig(1024, 1024, 1024),            # whole array, one step
        GemmConfig(1024, 1024, 512),
        GemmConfig(1024, 1024, 256),
        GemmConfig(512, 1024, 1024),
        GemmConfig(512, 1024, 512),
        GemmConfig(256, 1024, 1024),
        GemmConfig(256, 1024, 512),
        GemmConfig(1024, 512, 1024),
        GemmConfig(512, 512, 1024),
        GemmConfig(1024, 1024, 1024, vmem_limit_mb=64),
        GemmConfig(512, 1024, 1024, vmem_limit_mb=64),
        GemmConfig(256, 1024, 512, vmem_limit_mb=64),
        GemmConfig(128, 1024, 1024),
        GemmConfig(128, 1024, 512),
    ]

    want = ref_dequant_gemm(a, w_q, scales)
    best = (0.0, None)
    for cfg in candidates:
        def fn(a_, b_, s_):
            return dequant_gemm(a_, b_, s_, config=cfg)

        try:
            check_err(fn(a, w_q, scales), want)
            r = benchmark_chained(fn, a, w_q, scales, iters_lo=100,
                                  iters_hi=400, flops=flops)
        except Exception as e:
            print(f"{cfg and cfg.name() or 'heuristic':32s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:90]}")
            continue
        name = cfg.name() if cfg else "heuristic"
        print(f"{name:32s}: {r.tflops:6.1f} TF  ({r.avg_ms*1e3:6.2f} us)",
              flush=True)
        if r.tflops > best[0]:
            best = (r.tflops, name)
    print(f"best: {best[1]} at {best[0]:.1f} TF "
          f"({best[0] / 197.0 * 100:.0f}% MXU peak)")


if __name__ == "__main__":
    main()
