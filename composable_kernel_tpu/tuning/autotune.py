"""Autotuner + persistent tuning cache.

TPU analog of CK's ``ckProfiler`` selection loop
(``profiler/include/profiler/profile_gemm_impl.hpp:140-220``: run every
supported instance, verify, keep the fastest) and of the client-API pattern
(``client_example/30_gemm_bf16Aint8B/gemm_xdl_bf16_i8.cpp:146-254``). The
persistent JSON cache replaces CK's "users hardcode the winning instance"
workflow.

Keying: (op_family, problem key, device kind). Tuning only ever runs on the
real backend; on CPU/interpret the first supported instance is returned.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax

from composable_kernel_tpu.utils import env
from composable_kernel_tpu.utils.timing import benchmark, benchmark_chained


def _default_cache_path() -> Path:
    p = env.get("CKT_TUNE_CACHE")
    if p:
        return Path(p)
    return Path(os.path.expanduser("~/.cache/composable_kernel_tpu/tune.json"))


class TuneCache:
    def __init__(self, path: Path | None = None):
        self.path = path or _default_cache_path()
        self._data: dict[str, dict] | None = None

    def _load(self):
        if self._data is None:
            try:
                self._data = json.loads(self.path.read_text())
            except (OSError, ValueError):
                self._data = {}
        return self._data

    def get(self, key: str):
        return self._load().get(key)

    def put(self, key: str, value: dict):
        data = self._load()
        data[key] = value
        self.path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.path.with_suffix(".tmp")
        tmp.write_text(json.dumps(data, indent=1, sort_keys=True))
        tmp.replace(self.path)


_cache = TuneCache()


def autotune(
    op_family: str,
    problem_key: str,
    configs,
    run_with_config,
    *,
    flops: float = 0.0,
    warmup: int = 2,
    iters: int = 10,
    cache: TuneCache | None = None,
    verify_against=None,
    check=None,
    chain_args=None,
):
    """Pick the fastest config for this problem.

    ``run_with_config(cfg)`` must execute the op end-to-end and return the
    output (used for optional verification — CK profiler's verify step).
    ``chain_args``: optional (fn_of_cfg, arrays) pair for tunnel-honest
    chained-slope timing on TPU — ``fn_of_cfg(cfg)`` returns a callable
    ``f(*arrays)``; without it, wall-clock benchmark() is used (fine on a
    local host, noisy through a proxied runtime).
    Returns (best_config, results dict). Uses/updates the persistent cache.
    """
    cache = cache or _cache
    if not configs:
        raise ValueError(f"no supported instances for {op_family} {problem_key}")
    device_kind = jax.devices()[0].device_kind
    key = f"{op_family}|{problem_key}|{device_kind}"

    cached = cache.get(key)
    if cached is not None:
        for cfg in configs:
            if cfg.name() == cached["config"]:
                return cfg, cached
    if env.get("CKT_DISABLE_AUTOTUNE") or jax.default_backend() == "cpu":
        return configs[0], {"config": configs[0].name(), "avg_ms": None}

    best = None
    results = []
    for cfg in configs:
        try:
            out = run_with_config(cfg)
            if verify_against is not None and check is not None:
                check(out, verify_against)
            if chain_args is not None:
                fn_of_cfg, arrays = chain_args
                r = benchmark_chained(fn_of_cfg(cfg), *arrays, flops=flops)
            else:
                r = benchmark(
                    lambda: run_with_config(cfg), warmup=warmup, iters=iters,
                    flops=flops,
                )
        except Exception as e:  # unsupported at runtime — skip (CK: IsSupported reject)
            env.log(f"autotune {key}: {cfg.name()} failed: {e}")
            continue
        results.append((cfg, r))
        env.log(f"autotune {key}: {cfg.name()} {r.avg_ms:.3f} ms {r.tflops:.1f} TF")
        if best is None or r.avg_ms < best[1].avg_ms:
            best = (cfg, r)
    if best is None:
        raise RuntimeError(f"all instances failed for {key}")
    record = {
        "config": best[0].name(),
        "avg_ms": best[1].avg_ms,
        "tflops": best[1].tflops,
    }
    cache.put(key, record)
    return best[0], record
