from composable_kernel_tpu.ops.quant.api import dequant_gemm, int8_gemm, wo_quant_gemm
from composable_kernel_tpu.ops.quant.prepared import (
    PreparedWeights,
    prepare_w4a8,
    prepare_w8a8,
    prepare_wo_quant,
)
from composable_kernel_tpu.ops.quant.w4a8 import (
    quantize_act_token,
    w4a8_gemm,
    w8a8_gemm,
)

__all__ = [
    "PreparedWeights",
    "dequant_gemm",
    "int8_gemm",
    "prepare_w4a8",
    "prepare_w8a8",
    "prepare_wo_quant",
    "quantize_act_token",
    "w4a8_gemm",
    "w8a8_gemm",
    "wo_quant_gemm",
]
