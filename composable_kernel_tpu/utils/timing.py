"""Benchmark harness mirroring CK's timing discipline.

Reference: ``include/ck/stream_config.hpp:13-17`` (5 warmup + 50 timed
iterations, event timing) and ``host_utility/kernel_launch.hpp:36-62``. The
rotating-buffer / icache-flush trick (``flush_cache.hpp:25-90``) defeats
hot-cache bias; on TPU the analog is rotating through R input copies so HBM
reads cannot be served from a resident working set.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import jax


@dataclass
class BenchResult:
    avg_ms: float
    best_ms: float
    n_iters: int
    tflops: float = 0.0
    gbps: float = 0.0

    def perf_line(self, name: str = "") -> str:
        # CK prints: "Perf: <ms> ms, <tflops> TFlops, <GB/s> GB/s, <name>"
        return (
            f"Perf: {self.avg_ms:.4f} ms, {self.tflops:.2f} TFlops, "
            f"{self.gbps:.2f} GB/s, {name}"
        )


def benchmark(
    fn,
    *args,
    warmup: int = 5,
    iters: int = 50,
    flops: float = 0.0,
    bytes_accessed: float = 0.0,
    rotate: int = 1,
) -> BenchResult:
    """Time ``fn(*args)`` with CK's warmup/repeat discipline.

    If ``rotate > 1``, ``args`` must be a list of ``rotate`` argument tuples to
    cycle through (rotating buffers). Blocks on device completion each iter.
    """
    if rotate > 1:
        arg_sets = args[0]
        assert len(arg_sets) == rotate
    else:
        arg_sets = [args]

    for i in range(warmup):
        out = fn(*arg_sets[i % len(arg_sets)])
    jax.block_until_ready(out)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        out = fn(*arg_sets[i % len(arg_sets)])
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    avg = sum(times) / len(times)
    best = min(times)
    return BenchResult(
        avg_ms=avg * 1e3,
        best_ms=best * 1e3,
        n_iters=iters,
        tflops=(flops / avg) / 1e12 if flops else 0.0,
        gbps=(bytes_accessed / avg) / 1e9 if bytes_accessed else 0.0,
    )
