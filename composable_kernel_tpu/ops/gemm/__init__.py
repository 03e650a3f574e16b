from composable_kernel_tpu.ops.gemm.config import GemmConfig  # noqa: F401
from composable_kernel_tpu.ops.gemm.api import (  # noqa: F401
    gemm,
    batched_gemm,
    grouped_gemm,
)
