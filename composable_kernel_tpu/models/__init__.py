from composable_kernel_tpu.models.llama import (
    LlamaConfig,
    decode_step,
    forward,
    generate_greedy,
    init_kv_cache,
    seed_kv_cache,
    init_weights,
    llama3_8b,
    quantize_weights,
    tiny_config,
)

__all__ = [
    "LlamaConfig",
    "decode_step",
    "forward",
    "generate_greedy",
    "init_kv_cache",
    "seed_kv_cache",
    "init_weights",
    "llama3_8b",
    "quantize_weights",
    "tiny_config",
]
