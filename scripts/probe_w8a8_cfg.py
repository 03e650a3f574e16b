"""Probe W8A8 decode block configs at the slow N=11008 shape (drive saw
488 GB/s vs 731 at N=14336 — find whether the hybrid bn split or the
halved block_k is at fault). Run on the real chip."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from composable_kernel_tpu.ops.gemm.config import GemmConfig
from composable_kernel_tpu.ops.quant import w8a8_gemm
from composable_kernel_tpu.ops.quant.w4a8 import quantize_act_token
from composable_kernel_tpu.utils.timing import benchmark_chained


def main():
    assert jax.default_backend() == "tpu"
    k0 = jax.random.PRNGKey(0)
    for n in (11008, 14336):
        m, k = 8, 4096
        a = jax.random.normal(k0, (m, k), jnp.float32) * 0.5
        a_q, a_s = quantize_act_token(a)
        w_q = jax.random.randint(jax.random.fold_in(k0, 1), (k, n), -127,
                                 127, jnp.int8)
        w_s = jnp.abs(jax.random.normal(jax.random.fold_in(k0, 2), (n,),
                                        jnp.float32)) * 0.01
        cfgs = [
            ("default", None),
            ("whole-N bk1024", GemmConfig(block_m=32, block_n=-(-n // 128) * 128,
                                          block_k=1024, vmem_limit_mb=80)),
            ("whole-N bk512", GemmConfig(block_m=32, block_n=-(-n // 128) * 128,
                                         block_k=512, vmem_limit_mb=80)),
            ("bn~3.7k bk1024", GemmConfig(block_m=32, block_n=3712 if n == 11008 else 3584,
                                          block_k=1024, vmem_limit_mb=80)),
            ("bn~2.8k bk512", GemmConfig(block_m=32, block_n=2816 if n == 11008 else 2944,
                                         block_k=512, vmem_limit_mb=80)),
            ("bn~5.5k bk512", GemmConfig(block_m=32, block_n=5504 if n == 11008 else 7168,
                                         block_k=512, vmem_limit_mb=80)),
        ]
        for name, cfg in cfgs:
            try:
                r = benchmark_chained(
                    lambda aq: w8a8_gemm(aq, a_s, w_q, w_s, config=cfg),
                    a_q, bytes_accessed=float(k * n))
                print(f"N={n} {name}: {r.avg_ms:.3f} ms, {r.gbps:.0f} GB/s",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"N={n} {name}: FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
