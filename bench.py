"""Headline benchmark: W4A16 dequant GEMM at the reference's headline shape.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "TFlops", "vs_baseline": N}

Baseline = 119.136 TFlops: the reference's published fp16 GEMM sample
(M=3840 N=4096 K=4096 on gfx908/90a, docs/tutorial/tutorial_hello_world.rst:113-118
— see BASELINE.md). We run the *harder* op at the same shape: bf16 x int4
(g=128) weight-only dequant GEMM, dequant fused in-kernel, per SURVEY.md's
north star. Timing uses the chained-iteration slope method (constant
dispatch/tunnel overhead cancels).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from composable_kernel_tpu import dtypes
    from composable_kernel_tpu.ops.gemm.config import GemmConfig
    from composable_kernel_tpu.ops.quant import dequant_gemm
    from composable_kernel_tpu.reference.quant import ref_quantize_group
    from composable_kernel_tpu.utils.timing import benchmark_chained

    on_tpu = jax.default_backend() == "tpu"
    m, n, k, g = (3840, 4096, 4096, 128) if on_tpu else (256, 256, 512, 128)

    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    w_q, scales = ref_quantize_group(w, group_size=g, bits=4)
    packed = dtypes.pack_int4(w_q, axis=0)

    flops = 2.0 * m * n * k
    candidates = (
        [
            GemmConfig(256, 512, 512),
            GemmConfig(512, 512, 512),
            GemmConfig(256, 1024, 512),
            GemmConfig(512, 1024, 1024),
            GemmConfig(256, 512, 1024),
        ]
        if on_tpu
        else [GemmConfig(256, 256, 256)]
    )

    def run(cfg):
        def fn(a_, b_, s_):
            return dequant_gemm(
                a_, b_, s_, group_size=g, packed_int4=True, config=cfg,
                interpret=not on_tpu,
            )

        lo, hi = (20, 120) if on_tpu else (2, 4)
        return benchmark_chained(
            fn, a, packed, scales, iters_lo=lo, iters_hi=hi, flops=flops
        )

    best = None
    for cfg in candidates:
        try:
            r = run(cfg)
        except Exception as e:  # unsupported config on this chip
            print(f"# config {cfg.name()} failed: {e}", file=sys.stderr)
            continue
        print(f"# {cfg.name()}: {r.tflops:.1f} TFlops ({r.avg_ms:.3f} ms)",
              file=sys.stderr)
        if best is None or r.tflops > best.tflops:
            best = r

    baseline_tflops = 119.136  # reference fp16 GEMM headline (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"w4a16_dequant_gemm_{m}x{n}x{k}_g{g}_tflops",
                "value": round(best.tflops, 2),
                "unit": "TFlops",
                "vs_baseline": round(best.tflops / baseline_tflops, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
