from composable_kernel_tpu.parallel.pipeline import (
    make_pp_mesh,
    pp_decode,
    pp_forward,
    pp_train_grads_1f1b,
)
from composable_kernel_tpu.parallel.ring_attention import ring_attention
from composable_kernel_tpu.parallel.api import (
    init_opt_state,
    make_mesh,
    shard_params,
    tp_decode_step,
    tp_decode_step_batched,
    tp_forward,
    train_step,
)
from composable_kernel_tpu.parallel.distributed import (
    MeshPlan,
    auto_mesh_plan,
    init_distributed,
    make_hybrid_mesh,
)

__all__ = [
    "init_opt_state",
    "make_pp_mesh",
    "pp_decode",
    "pp_forward",
    "pp_train_grads_1f1b",
    "ring_attention",
    "make_mesh",
    "shard_params",
    "tp_decode_step",
    "tp_decode_step_batched",
    "tp_forward",
    "train_step",
    "MeshPlan",
    "auto_mesh_plan",
    "init_distributed",
    "make_hybrid_mesh",
]
