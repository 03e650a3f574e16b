"""Host codegen + AOT artifacts (CK codegen/ analog).

The reference's codegen library emits device-op template-instantiation
source strings that JIT consumers runtime-compile
(codegen/src/device_gemm_multiple_d.cpp:14-33). Here a Problem enumerates
registry instances as Solutions, each emitting (1) a self-contained
Python module string, (2) StableHLO, (3) a portable jax.export artifact
that a serving process can load and call with ZERO Python tracing — plus
the persistent XLA compile cache for warm process restarts.
"""
from _common import setup

jnp, on_tpu = setup()
import tempfile
import time

import jax
import numpy as np

from composable_kernel_tpu.codegen import (
    AotCache,
    GemmMultipleDProblem,
    WoQuantGemmProblem,
    deserialize_solution,
    get_solutions,
)
from composable_kernel_tpu import dtypes
from composable_kernel_tpu.utils.check_err import check_err

m, n, k, g = (128, 4096, 4096, 128) if on_tpu else (32, 256, 256, 128)

# --- 1. enumerate + emit (Problem::GetSolutions analog) -----------------
p = GemmMultipleDProblem(m=m, n=n, k=k, epilogue="add_fast_gelu",
                         d_shapes=((),))
sols = get_solutions(p)
print(f"{p.key()}: {len(sols)} solutions; first = {sols[0].name}")
print("--- emitted source (first 6 lines) ---")
print("\n".join(sols[0].source.splitlines()[:6]))

# --- 2. build (exec the emitted string) + verify ------------------------
run = sols[0].build()
a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32).astype(jnp.bfloat16)
b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32).astype(jnp.bfloat16)
bias = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.float32)
out = np.asarray(run(a, b, bias)).astype(np.float64)
acc = np.asarray(a, np.float64) @ np.asarray(b, np.float64) + np.asarray(bias, np.float64)
ref = 0.5 * acc * (1 + np.tanh(np.sqrt(2 / np.pi) * (acc + 0.044715 * acc**3)))
check_err(out, ref, rtol=2e-2, atol=2e-2)
print("emitted gemm+bias+fast_gelu: OK")

# --- 3. wo-quant solution (the north-star family) -----------------------
pq = WoQuantGemmProblem(m=16, n=n, k=k, weight_dtype="int4", group_size=g)
w_q = jax.random.randint(jax.random.PRNGKey(3), (k, n), -8, 8, jnp.int8)
scales = (jax.random.uniform(jax.random.PRNGKey(4), (k // g, n)) * 0.1 + 0.01)
packed = dtypes.pack_int4(w_q, axis=0)
aq = jax.random.normal(jax.random.PRNGKey(5), (16, k), jnp.float32).astype(jnp.bfloat16)
outq = np.asarray(get_solutions(pq)[0].build()(aq, packed, scales.astype(jnp.float32)))
wdq = (np.asarray(w_q, np.float64).reshape(k // g, g, n)
       * np.asarray(scales, np.float64)[:, None, :]).reshape(k, n)
# the kernel feeds the MXU bf16-dequantized weights; round the reference
wdq = np.asarray(jnp.asarray(wdq).astype(jnp.bfloat16), np.float64)
refq = np.asarray(aq, np.float64) @ wdq
check_err(outq.astype(np.float64), refq, rtol=3e-2, atol=3e-2)
print("emitted w4a16 dequant gemm: OK")

# --- 4. AOT export + cache (serve without tracing) ----------------------
with tempfile.TemporaryDirectory() as d:
    cache = AotCache(d)
    t0 = time.perf_counter()
    fn, hit = cache.load_or_build(sols[0])
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn2, hit2 = cache.load_or_build(sols[0])
    t_load = time.perf_counter() - t0
    assert (hit, hit2) == (False, True)
    np.testing.assert_array_equal(np.asarray(fn(a, b, bias)),
                                  np.asarray(fn2(a, b, bias)))
    blob = sols[0].serialize()
    fn3 = deserialize_solution(blob)
    np.testing.assert_array_equal(np.asarray(fn3(a, b, bias)),
                                  np.asarray(fn(a, b, bias)))
    print(f"AOT artifact: {len(blob)/1024:.0f} KiB; build {t_build:.2f}s, "
          f"cache load {t_load*1e3:.0f} ms; roundtrip numerics: OK")
