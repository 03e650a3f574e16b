"""Attention kernel instance configuration.

Analog of ck_tile's fmha tile-shape policy space
(``ops/fmha/pipeline/block_fmha_pipeline_problem.hpp`` tile sizes and the
generated instance grid of ``example/ck_tile/01_fmha/generate.py``): the
tunable surface on TPU reduces to the Q and KV block lengths plus the
decode split count.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass


@dataclass(frozen=True)
class AttentionConfig:
    # defaults from a measured v5e sweep (4k causal GQA): (1024, 1024) runs
    # 104 TF-effective vs 64 for (512, 512)
    block_q: int = 1024
    block_k: int = 1024
    # split-KV count for flash-decoding (fmha_fwd_splitkv_kernel num_splits);
    # 1 = no split. Used by flash_decode only.
    num_splits: int = 1
    # opt-in scoped-VMEM raise (Mosaic's default scoped limit is 16 MB;
    # block_q=2048 tiles need more — same mechanism as GemmConfig)
    vmem_limit_mb: int | None = None

    def name(self) -> str:
        vm = f"_vm{self.vmem_limit_mb}" if self.vmem_limit_mb else ""
        return f"fmha_{self.block_q}x{self.block_k}_s{self.num_splits}{vm}"

    def replace(self, **kw) -> "AttentionConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_ATTENTION_CONFIGS = [
    AttentionConfig(1024, 1024),
    AttentionConfig(512, 1024),
    AttentionConfig(2048, 1024, vmem_limit_mb=32),
    AttentionConfig(512, 512),
    AttentionConfig(256, 512),
    AttentionConfig(128, 512),
]
