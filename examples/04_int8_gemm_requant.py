"""int8 x int8 GEMM with requant epilogue, bit-exact
(CK example/14_gemm_quantization analog)."""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import numpy as np

from composable_kernel_tpu.ops import epilogues as ep
from composable_kernel_tpu.ops.quant import int8_gemm
from composable_kernel_tpu.reference.quant import ref_int8_gemm_requant

m, n, k = (1024, 1024, 2048) if on_tpu else (64, 128, 256)
rng = np.random.default_rng(0)
a_q = jnp.asarray(rng.integers(-128, 128, (m, k)), jnp.int8)
b_q = jnp.asarray(rng.integers(-128, 128, (k, n)), jnp.int8)
op = ep.activation_mul_clamp(ep.relu, 0.0123)

out = time_and_report(
    "int8_gemm_relu_requant",
    lambda a_, b_: int8_gemm(a_, b_, op),
    a_q, b_q,
    flops=2.0 * m * n * k, on_tpu=on_tpu,
)
want = ref_int8_gemm_requant(a_q, b_q, op)
assert (np.asarray(out) == np.asarray(want)).all(), "int path must be bit-exact"
print("verification: OK (bit-exact)")
