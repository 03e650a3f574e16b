"""Operator catalog — the device-op layer surface (SURVEY.md §2.3).

Each submodule is one CK op family re-designed TPU-first:

  gemm          GEMM + batched/grouped/splitk + fused epilogue + reduce/
                layernorm/B2B variants
  quant         weight-only dequant GEMM (int8/int4), int8 requant GEMM
  attention     flash fwd, split-KV decode, int8 KV cache
  normalization softmax / layernorm / rmsnorm / groupnorm / batchnorm
  reduce        reduction functor zoo + multiple-reduce
  conv          grouped Nd conv fwd/bwd + quantized conv
  pool          avg/max pool fwd/bwd
  tensor_ops    elementwise / permute / put_element / im2col / col2im
  contraction   multi-dim-M/N/K contraction, complex GEMM
  embedding     sparse embedding + fused layernorm
  epilogues     the elementwise functor zoo threaded through everything
"""

from composable_kernel_tpu.ops import epilogues
from composable_kernel_tpu.ops.attention import flash_attention, flash_decode
from composable_kernel_tpu.ops.contraction import (
    batched_contraction,
    cgemm,
    contraction,
)
from composable_kernel_tpu.ops.conv import (
    conv_bwd_data,
    conv_bwd_weight,
    conv_fwd,
    conv_int8,
    conv_wo_quant,
)
from composable_kernel_tpu.ops.embedding import sparse_embedding_layernorm
from composable_kernel_tpu.ops.gemm.api import (
    batched_gemm,
    batched_gemm_gemm,
    gemm,
    gemm_layernorm,
    gemm_reduce,
    grouped_gemm,
)
from composable_kernel_tpu.ops.normalization import (
    batchnorm_bwd,
    batchnorm_infer,
    batchnorm_train,
    norm_bwd,
    groupnorm,
    layernorm,
    rmsnorm,
    softmax,
)
from composable_kernel_tpu.ops.pool import (
    avg_pool,
    avg_pool_bwd,
    max_pool,
    max_pool_bwd,
)
from composable_kernel_tpu.ops.quant import dequant_gemm, int8_gemm, wo_quant_gemm
from composable_kernel_tpu.ops.reduction import multiple_reduce, reduce
from composable_kernel_tpu.ops.tensor_ops import (
    column_to_image,
    elementwise,
    image_to_column,
    permute,
    put_element,
)

__all__ = [
    "epilogues",
    "flash_attention", "flash_decode",
    "batched_contraction", "cgemm", "contraction",
    "conv_bwd_data", "conv_bwd_weight", "conv_fwd", "conv_int8",
    "conv_wo_quant",
    "sparse_embedding_layernorm",
    "batched_gemm", "batched_gemm_gemm", "gemm", "gemm_layernorm",
    "gemm_reduce", "grouped_gemm",
    "batchnorm_infer", "batchnorm_train", "batchnorm_bwd", "norm_bwd",
    "groupnorm", "layernorm", "rmsnorm", "softmax",
    "avg_pool", "avg_pool_bwd", "max_pool", "max_pool_bwd",
    "dequant_gemm", "int8_gemm", "wo_quant_gemm",
    "multiple_reduce", "reduce",
    "column_to_image", "elementwise", "image_to_column", "permute",
    "put_element",
]
