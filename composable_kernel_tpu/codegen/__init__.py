"""Host codegen — CK's ``codegen/`` library, TPU-native.

The reference emits *template-instantiation source strings* for a given
problem so downstream JIT consumers (MIGraphX-style) can runtime-compile
exactly the instances they need:

- ``Problem::GetSolutions(arch, prologue, epilogue)`` returns a vector of
  ``Solution`` objects wrapping an instantiation string
  (``codegen/src/device_gemm_multiple_d.cpp:14-33``,
  ``codegen/include/ck/host/device_gemm_multiple_d/operation.hpp:22-50``);
- coverage is gemm_multiple_d + grouped_conv_fwd;
- ``codegen/test/`` compiles the emitted strings via hip RTC and runs them.

TPU-native translation: JAX tracing is the template instantiation, XLA is
the RTC compiler, so a "Solution" here carries three artifact forms:

1. ``emit()`` — a self-contained Python module *source string* with the
   instance config baked in (the direct string-emission parity; consumers
   write it next to their build or ``build()``/exec it);
2. ``lower()`` — the StableHLO for the instance at the problem's shapes
   (what hip RTC's input is to the reference);
3. ``serialize()`` — portable ``jax.export`` bytes: the ahead-of-time
   artifact a serving process loads without retracing Python.

:class:`AotCache` persists form 3 per (problem, instance, platform) —
the analog of the reference compiling its emitted sources into a cached
library. Coverage matches the reference (gemm_multiple_d,
grouped_conv_fwd) plus the framework's north-star wo-quant GEMM family.
"""

from composable_kernel_tpu.codegen.problems import (
    AttentionProblem,
    GemmMultipleDProblem,
    GroupedConvFwdProblem,
    WoQuantGemmProblem,
)
from composable_kernel_tpu.codegen.emit import (
    Solution,
    dispatch_attention,
    get_solutions,
)
from composable_kernel_tpu.codegen.aot import (
    AotCache,
    deserialize_solution,
    enable_persistent_compile_cache,
)

__all__ = [
    "AttentionProblem",
    "dispatch_attention",
    "GemmMultipleDProblem",
    "GroupedConvFwdProblem",
    "WoQuantGemmProblem",
    "Solution",
    "get_solutions",
    "AotCache",
    "deserialize_solution",
    "enable_persistent_compile_cache",
]
