"""Plain bf16 GEMM (CK example/01_gemm analog)."""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax
import numpy as np

from composable_kernel_tpu.ops import gemm
from composable_kernel_tpu.utils.check_err import check_err

m, n, k = (3840, 4096, 4096) if on_tpu else (256, 256, 256)
a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32).astype(jnp.bfloat16)
b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32).astype(jnp.bfloat16)

out = time_and_report(
    "gemm_bf16", lambda a_, b_: gemm(a_, b_), a, b,
    flops=2.0 * m * n * k, on_tpu=on_tpu,
)
ref = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
check_err(out, ref, rtol=2e-2, atol=2e-2)
print("verification: OK")
