from composable_kernel_tpu.tuning.registry import (  # noqa: F401
    InstanceRegistry,
    registry,
)
from composable_kernel_tpu.tuning.autotune import autotune, TuneCache  # noqa: F401
