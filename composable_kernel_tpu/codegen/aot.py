"""AOT artifact cache for emitted solutions.

CK analog: the reference's consumers RTC-compile codegen's emitted strings
once and keep the binaries (MIGraphX caches compiled code objects); CK
itself ships the precompiled instance library. TPU-native equivalents:

1. **Portable artifacts** — ``jax.export`` bytes per (problem, instance),
   persisted by :class:`AotCache`; a serving process deserializes and
   calls without ever tracing Python (the framework need not even be
   importable where the artifact runs).
2. **Persistent XLA compilation cache** —
   :func:`enable_persistent_compile_cache` turns on JAX's on-disk
   compiled-executable cache so even first-call jit compiles are reused
   across processes (the direct analog of "compile once, link the
   library").
"""

from __future__ import annotations

import hashlib
import os

import jax


def deserialize_solution(data: bytes):
    """bytes from ``Solution.serialize()`` / ``AotCache`` -> callable."""
    from jax import export

    exp = export.deserialize(data)
    return exp.call


class AotCache:
    """Disk cache of serialized solutions, keyed by (solution name,
    platform, jax version) — cf. the per-arch instance libraries CK
    builds (``library/src/tensor_operation_instance/gpu``: one compiled
    object per instance per gfx target)."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _path(self, solution) -> str:
        platform = jax.default_backend()
        # the emitted source + abstract arg spec participate in the key so
        # any emitter/spec change invalidates stale artifacts
        spec = ",".join(map(str, solution.problem.abstract_args()))
        raw = (
            f"{solution.name}|{platform}|{jax.__version__}"
            f"|{spec}|{solution.source}"
        )
        h = hashlib.sha256(raw.encode()).hexdigest()[:16]
        return os.path.join(self.cache_dir, f"{h}.jaxexport")

    def load_or_build(self, solution):
        """Return a callable for the solution, serializing on first use.

        Returns ``(fn, hit)`` where ``hit`` says whether the artifact came
        from disk.
        """
        path = self._path(solution)
        if os.path.exists(path):
            with open(path, "rb") as f:
                return deserialize_solution(f.read()), True
        data = solution.serialize()
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return deserialize_solution(data), False


def enable_persistent_compile_cache(cache_dir: str) -> None:
    """Point XLA's persistent compilation cache at ``cache_dir`` so
    compiled executables survive process restarts (serving cold-start:
    the 20-40 s first-compile of the decode step happens once per
    machine, not once per process)."""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything, however small/fast to compile
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
