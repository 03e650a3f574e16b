from composable_kernel_tpu.profiler.cli import main, OPERATIONS

__all__ = ["main", "OPERATIONS"]
