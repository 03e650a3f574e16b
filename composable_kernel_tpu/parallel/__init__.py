from composable_kernel_tpu.parallel.pipeline import make_pp_mesh, pp_forward
from composable_kernel_tpu.parallel.ring_attention import ring_attention
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
    "make_pp_mesh",
    "pp_forward",
    "ring_attention",
    "make_mesh",
    "shard_params",
    "tp_decode_step",
    "tp_forward",
    "train_step",
]
