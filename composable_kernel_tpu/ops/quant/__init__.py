from composable_kernel_tpu.ops.quant.api import dequant_gemm, int8_gemm, wo_quant_gemm

__all__ = ["dequant_gemm", "int8_gemm", "wo_quant_gemm"]
