from composable_kernel_tpu.profiler.cli import main, OPERATIONS
from composable_kernel_tpu.profiler import extra  # register extra engines

__all__ = ["main", "OPERATIONS"]
