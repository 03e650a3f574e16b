from composable_kernel_tpu.ops.quant.api import dequant_gemm, int8_gemm, wo_quant_gemm
from composable_kernel_tpu.ops.quant.w4a8 import (
    quantize_act_token,
    w4a8_gemm,
    w8a8_gemm,
)

__all__ = [
    "dequant_gemm",
    "int8_gemm",
    "quantize_act_token",
    "w4a8_gemm",
    "w8a8_gemm",
    "wo_quant_gemm",
]
