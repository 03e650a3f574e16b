from composable_kernel_tpu.utils.check_err import check_err, tolerances  # noqa: F401
from composable_kernel_tpu.utils.host_tensor import make_tensor  # noqa: F401
from composable_kernel_tpu.utils.timing import benchmark  # noqa: F401
