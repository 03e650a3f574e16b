from composable_kernel_tpu.runtime import native

__all__ = ["native"]
