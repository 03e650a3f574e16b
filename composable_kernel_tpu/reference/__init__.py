"""Pure-jnp golden reference implementations.

TPU analog of CK's host reference ops
(``library/include/ck/library/reference_tensor_operation/cpu/`` — 28 files:
reference_gemm.hpp, reference_fpAintB_gemm.hpp, reference_batched_gemm.hpp,
reference_conv_fwd.hpp, reference_softmax.hpp, reference_layernorm.hpp, ...).
Every Pallas kernel in ``ops/`` is verified against these with
``utils.check_err`` tolerances, mirroring CK's test strategy (SURVEY.md §4).

All functions compute in float32 (or int32 for integer paths) regardless of
input dtype, exactly as CK's references accumulate in AccDataType=float.
"""

from composable_kernel_tpu.reference.gemm import (  # noqa: F401
    ref_gemm,
    ref_batched_gemm,
    ref_grouped_gemm,
    ref_contraction,
)
from composable_kernel_tpu.reference.quant import (  # noqa: F401
    ref_dequant_gemm,
    ref_int8_gemm_requant,
    ref_quantize_per_channel,
    ref_quantize_group,
)
from composable_kernel_tpu.reference.attention import (  # noqa: F401
    ref_attention,
    ref_attention_varlen,
    ref_gemm_softmax_gemm,
)
from composable_kernel_tpu.reference.normalization import (  # noqa: F401
    ref_softmax,
    ref_layernorm,
    ref_rmsnorm,
    ref_groupnorm,
    ref_batchnorm_infer,
)
from composable_kernel_tpu.reference.conv import (  # noqa: F401
    ref_conv_fwd,
    ref_pool,
)
from composable_kernel_tpu.reference.reduce import ref_reduce  # noqa: F401
