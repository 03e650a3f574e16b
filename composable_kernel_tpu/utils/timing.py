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

    out = None
    for i in range(warmup):
        out = fn(*arg_sets[i % len(arg_sets)])
    if out is not None:
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


def benchmark_chained(
    fn,
    a,
    *rest,
    iters_lo: int = 20,
    iters_hi: int = 100,
    flops: float = 0.0,
    bytes_accessed: float = 0.0,
    min_signal_s: float = 0.25,
) -> BenchResult:
    """Tunnel-honest timing: chain ``n`` calls of ``fn(a, *rest)`` inside ONE
    jit via a tiny data dependency on ``a``, return only a scalar (a full
    readback over a proxied runtime costs ~1s), and use the slope between
    two iteration counts so constant dispatch/transfer overhead cancels.
    The trip count is a *traced* argument, so growing it to beat timing
    jitter costs no recompiles.
    """
    import numpy as np
    import jax.numpy as jnp
    import jax as _jax

    @_jax.jit
    def loop(n, a, *rest):
        def body(i, a):
            out = fn(a, *rest)
            bump = out.reshape(-1)[0].astype(jnp.float32) * 1e-30
            return a + bump.astype(a.dtype)
        a = _jax.lax.fori_loop(0, n, body, a)
        return a.reshape(-1)[0]

    np.asarray(loop(iters_hi, a, *rest))  # compile + warm

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(n, a, *rest))
            best = min(best, time.perf_counter() - t0)
        return best

    lo, hi = iters_lo, iters_hi
    for _ in range(8):
        t_lo, t_hi = t(lo), t(hi)
        if t_hi - t_lo >= min_signal_s or hi >= 200_000:
            break
        lo, hi = hi, hi * 4
    per_iter = max((t_hi - t_lo) / (hi - lo), 1e-9)
    return BenchResult(
        avg_ms=per_iter * 1e3,
        best_ms=per_iter * 1e3,
        n_iters=hi,
        tflops=(flops / per_iter) / 1e12 if flops else 0.0,
        gbps=(bytes_accessed / per_iter) / 1e9 if bytes_accessed else 0.0,
    )
