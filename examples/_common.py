"""Shared example scaffolding (CK: example/.../common.hpp + run_*.inc).

Auto-selects interpret mode off-TPU, provides the CK-style perf printer
and verification entry.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax


def setup():
    """Returns (jnp, on_tpu). Forces CPU when no TPU is present or when
    CKT_EXAMPLES_CPU=1 (CI smoke runs avoid the shared chip)."""
    import os

    force_cpu = os.environ.get("CKT_EXAMPLES_CPU") == "1"
    if force_cpu or jax.default_backend() != "tpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
        os.environ.setdefault("CKT_INTERPRET", "1")
    import jax.numpy as jnp

    return jnp, jax.default_backend() == "tpu"


def time_and_report(name, fn, *args, flops=0.0, bytes_accessed=0.0, on_tpu=False):
    """CK 'Perf: <ms> ms, <tflops> TFlops, <GB/s>' line."""
    import numpy as np

    out = fn(*args)
    jax.block_until_ready(out)
    if on_tpu:
        from composable_kernel_tpu.utils.timing import benchmark_chained

        r = benchmark_chained(fn, *args, flops=flops, bytes_accessed=bytes_accessed)
        ms, tf, gb = r.avg_ms, r.tflops, r.gbps
    else:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) * 1e3
        tf = flops / (ms / 1e3) / 1e12 if flops else 0.0
        gb = bytes_accessed / (ms / 1e3) / 1e9 if bytes_accessed else 0.0
    print(f"Perf: {ms:.4f} ms, {tf:.2f} TFlops, {gb:.2f} GB/s, {name}")
    return out
