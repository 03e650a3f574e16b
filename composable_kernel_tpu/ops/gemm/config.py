"""GEMM instance configuration.

TPU analog of CK's template-parameter space. One ``GemmConfig`` plays the
role of one CK device-op *instance* (a fully-instantiated
``DeviceGemm_Xdl_CShuffle<BlockSize, MPerBlock, NPerBlock, KPerBlock, ...>``
from the instance libraries, e.g.
``library/src/.../gemm/device_gemm_xdl_c_shuffle_f16_f16_f16_mk_kn_mn_instance.cpp:38-56``,
and the ck4inductor mirror ``python/ck4inductor/universal_gemm/op.py:6-76``).

On TPU the tunable surface is much smaller because Mosaic/XLA handle what
CK's per-thread/warp template params (vector widths, LDS staging, MFMA
scheduling) hand-tune: what remains is the block tiling, the K-reduction
split, and pipelining depth.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class GemmConfig:
    """One GEMM kernel instance (CK 'instantiated kernel' analog)."""

    block_m: int = 256
    block_n: int = 256
    block_k: int = 256
    # split the K reduction across this many grid slots (CK split-K,
    # device_gemm_xdl_splitk_c_shuffle.hpp). 1 = no split.
    split_k: int = 1
    # number of pipeline buffers Mosaic should use for input streaming
    # (CK's blockwise pipeline v1..v5 depth analog); None = compiler default.
    dimension_order: str = "mnk"  # grid iteration order
    # Mosaic scoped-VMEM budget override in MiB. None = the 16 MiB compiler
    # default. Measured on v5e: raising it is REQUIRED for wide decode
    # blocks (whole-N dequant tiles >16 MiB -> 590 GB/s vs 300 split), but
    # raising it on MXU-bound prefill shapes costs ~10% (176.5 -> 161 TF at
    # the headline shape) — so it is strictly opt-in per instance.
    vmem_limit_mb: int | None = None

    def name(self) -> str:
        # cf. CK GetTypeString() (device_base.hpp:47)
        vm = f"_vm{self.vmem_limit_mb}" if self.vmem_limit_mb else ""
        return (
            f"gemm_{self.block_m}x{self.block_n}x{self.block_k}"
            f"_sk{self.split_k}_{self.dimension_order}{vm}"
        )

    def replace(self, **kw) -> "GemmConfig":
        return dataclasses.replace(self, **kw)

    def shrink_to(self, m: int, n: int, k: int) -> "GemmConfig":
        """Clamp block sizes to (padded) problem dims, keeping TPU alignment."""

        def clamp(block, dim, align):
            padded = -(-dim // align) * align
            return min(block, max(align, padded))

        return self.replace(
            block_m=clamp(self.block_m, m, 8),
            block_n=clamp(self.block_n, n, 128),
            block_k=clamp(self.block_k, k, 128),
        )


def is_supported(cfg: GemmConfig, m: int, n: int, k: int, dtype_bytes: int = 2) -> bool:
    """Supported-argument predicate (CK IsSupportedArgument analog,
    device_base.hpp:46). Rejects configs whose VMEM working set cannot fit
    or whose split-K does not divide the K tiling."""
    # matches pallas_gemm's k_steps_total = ceil(K / block_k) on the padded K;
    # the kernel raises (never silently degrades) on violation
    if cfg.split_k > 1 and (-(-k // cfg.block_k)) % cfg.split_k != 0:
        return False
    # A + B + out + acc working set, x2 for double buffering of inputs.
    # Empirically on v5e, (1024,1024,512) (≈10MB by this estimate) OOMs VMEM
    # while (512,1024,1024) (≈9MB) fits under Mosaic's default 16 MiB scoped
    # budget, so the usable fraction is ~0.6 of the budget. Configs may
    # raise the budget (vmem_limit_mb) up to the chip's 128 MiB.
    vmem = (
        2 * (cfg.block_m * cfg.block_k + cfg.block_k * cfg.block_n) * dtype_bytes
        + cfg.block_m * cfg.block_n * (dtype_bytes + 4)
    )
    budget = (cfg.vmem_limit_mb or 16) * 1024 * 1024
    return vmem <= int(0.6 * budget)


# Default instance list (CK instance-library analog). Ordered by preference
# for large problems; the autotuner refines per-shape. Measured on v5e
# (bf16 4096^3): 512x1024x1024 -> 172 TF (~87% of 197 TF peak).
DEFAULT_GEMM_CONFIGS = [
    GemmConfig(512, 1024, 1024),
    GemmConfig(512, 512, 2048),
    GemmConfig(512, 512, 1024),
    GemmConfig(512, 512, 512),
    GemmConfig(1024, 512, 1024),
    GemmConfig(256, 1024, 1024),
    GemmConfig(256, 512, 512),
    GemmConfig(128, 256, 512),
    GemmConfig(128, 128, 512),
    GemmConfig(64, 256, 512),
    GemmConfig(32, 512, 512),
    GemmConfig(16, 512, 512),
    GemmConfig(8, 512, 512),
    # decode shapes (M small, K deep) — cf. script/profile_mixed_gemm.sh
    GemmConfig(8, 1024, 512),
    GemmConfig(16, 1024, 1024),
    # wide-N decode blocks: HBM-rate winners for M<=32 weight-streaming
    # (measured v5e: block_k=1024 is 2x over 512; bn ~4k optimal)
    GemmConfig(16, 4096, 1024),
    GemmConfig(16, 3584, 1024),
    GemmConfig(32, 2048, 1024),
    # W4A8 decode winners: ~3.5-4k N chunks + the scoped-VMEM raise
    # (632-659 GB/s at Llama shapes, scripts/bench_w4a8.py sweeps)
    GemmConfig(32, 3712, 1024, vmem_limit_mb=64),
    GemmConfig(32, 3584, 1024, vmem_limit_mb=64),
    GemmConfig(32, 4096, 1024, vmem_limit_mb=64),
]
