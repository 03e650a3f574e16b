"""GEMM + add + add + fastgelu fused epilogue (CK example/04 analog)."""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax
import numpy as np

from composable_kernel_tpu.ops import epilogues as ep, gemm
from composable_kernel_tpu.reference.gemm import ref_gemm
from composable_kernel_tpu.utils.check_err import check_err

m, n, k = (1024, 1024, 1024) if on_tpu else (128, 256, 256)
key = jax.random.split(jax.random.PRNGKey(0), 4)
a = jax.random.normal(key[0], (m, k), jnp.float32).astype(jnp.bfloat16)
b = jax.random.normal(key[1], (k, n), jnp.float32).astype(jnp.bfloat16)
d0 = jax.random.normal(key[2], (m, n), jnp.float32).astype(jnp.bfloat16)
bias = jax.random.normal(key[3], (n,), jnp.float32)

out = time_and_report(
    "gemm_add_add_fastgelu",
    lambda a_, b_, d_, bi: gemm(a_, b_, ds=(d_, bi), c_op=ep.add_add_fast_gelu),
    a, b, d0, bias,
    flops=2.0 * m * n * k, on_tpu=on_tpu,
)
acc = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
want = np.asarray(
    ep.fast_gelu(jnp.asarray(acc + np.asarray(d0, np.float64) + np.asarray(bias)[None, :], jnp.float32))
)
check_err(out, want, rtol=3e-2, atol=3e-2)
print("verification: OK")
