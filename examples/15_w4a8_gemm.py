"""W4A8 GEMM: int4 weights x per-token int8 activations on the int8 MXU.

The int4-decode ceiling breaker (docs/performance.md): AND-only nibble
extraction feeds the int8 MXU directly — no shifts, no widening, no float
converts on the weight stream. CK analog: FastNumericArrayConverter's
offset-binary trick (element/unary_element_wise_operation.hpp:1061-1094)
retargeted at the int8 matrix unit. Also demos the fused
rmsnorm+activation-quant kernel that feeds it in the serving stack.
"""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax
import numpy as np

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.ops.normalization import rmsnorm_quant
from composable_kernel_tpu.ops.quant import quantize_act_token, w4a8_gemm
from composable_kernel_tpu.reference.quant import ref_quantize_group, ref_w4a8_gemm
from composable_kernel_tpu.utils.check_err import check_err

m, n, k, g = (16, 14336, 4096, 128) if on_tpu else (8, 512, 1024, 128)
x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.1
w_q, scales = ref_quantize_group(w, group_size=g, bits=4)
packed = dtypes.pack_int4_w4a8(w_q, axis=0)

# serving path: one fused kernel does the norm AND the activation quant
gamma = jnp.ones((k,), jnp.float32)
a_q, a_s = rmsnorm_quant(x, gamma)

weight_bytes = packed.size + scales.size * 4
out = time_and_report(
    f"w4a8_gemm_g{g}",
    lambda q_, s_, p_, ws_: w4a8_gemm(q_, s_, p_, ws_, group_size=g),
    a_q, a_s, packed, scales,
    flops=2.0 * m * n * k, bytes_accessed=float(weight_bytes), on_tpu=on_tpu,
)
want = ref_w4a8_gemm(a_q, a_s, w_q, scales, group_size=g)
check_err(out, want)

# the standalone activation quantizer matches the fused kernel's contract
aq_ref, as_ref = quantize_act_token(jnp.asarray(np.asarray(out)))  # shape demo
assert aq_ref.dtype == a_q.dtype and as_ref.shape[-1] == a_s.shape[-1]
print("verification: OK")
