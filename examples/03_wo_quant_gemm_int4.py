"""Weight-only int4 (g=128) dequant GEMM — the north-star op
(CK example/64_fpAintB_gemm + client_example/30 analog)."""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax
import numpy as np

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.ops.quant import wo_quant_gemm
from composable_kernel_tpu.reference.quant import ref_dequant_gemm, ref_quantize_group
from composable_kernel_tpu.utils.check_err import check_err

m, n, k, g = (16, 14336, 4096, 128) if on_tpu else (8, 512, 1024, 128)
a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32).astype(jnp.bfloat16)
w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
w_q, scales = ref_quantize_group(w, group_size=g, bits=4)
packed = dtypes.pack_int4(w_q, axis=0)

weight_bytes = packed.size + scales.size * 4
out = time_and_report(
    f"wo_quant_gemm_i4_g{g}",
    lambda a_, p_, s_: wo_quant_gemm(a_, p_, s_, group_size=g, packed_int4=True),
    a, packed, scales,
    flops=2.0 * m * n * k, bytes_accessed=float(weight_bytes), on_tpu=on_tpu,
)
want = ref_dequant_gemm(a, packed, scales, group_size=g, packed_int4=True)
check_err(out, want)
print("verification: OK")
