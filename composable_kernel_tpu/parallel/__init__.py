from composable_kernel_tpu.parallel.api import (
    init_opt_state,
    make_mesh,
    shard_params,
    tp_decode_step,
    tp_forward,
    train_step,
)

__all__ = [
    "init_opt_state",
    "make_mesh",
    "shard_params",
    "tp_decode_step",
    "tp_forward",
    "train_step",
]
