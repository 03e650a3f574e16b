from composable_kernel_tpu.ops.attention.config import (
    DEFAULT_ATTENTION_CONFIGS,
    AttentionConfig,
)
from composable_kernel_tpu.ops.attention.backward import flash_attention_grad
from composable_kernel_tpu.ops.attention.kernel import (
    alibi_slopes_for_heads,
    flash_attention,
    flash_decode,
)
from composable_kernel_tpu.ops.attention.varlen import (
    flash_attention_varlen,
    flash_attention_varlen_cache,
    pack_varlen,
    unpack_varlen,
)
from composable_kernel_tpu.ops.attention.paged import (
    PagedKVCache,
    decode_attention,
    paged_flash_decode,
)

__all__ = [
    "AttentionConfig",
    "DEFAULT_ATTENTION_CONFIGS",
    "PagedKVCache",
    "alibi_slopes_for_heads",
    "decode_attention",
    "flash_attention",
    "flash_attention_grad",
    "flash_attention_varlen",
    "flash_attention_varlen_cache",
    "flash_decode",
    "pack_varlen",
    "paged_flash_decode",
    "unpack_varlen",
]
