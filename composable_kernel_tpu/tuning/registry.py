"""Instance registry — CK's instance-library + factory layer, in Python.

Reference: ``add_device_operation_instances``
(``library/include/ck/library/tensor_operation_instance/add_device_operation_instance.hpp:16-30``)
and ``DeviceOperationInstanceFactory<DeviceOp>::GetInstances()``
(``gemm_multi_abd.hpp:248-313``). CK compiles 966 .cpp instance files into a
library and selects at runtime; here instances are config dataclasses
registered per op family, and "GetInstances" is a dict lookup filtered by a
supported-predicate — JAX tracing does the instantiation.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Sequence


class InstanceRegistry:
    def __init__(self):
        self._instances: dict[str, list] = defaultdict(list)
        self._predicates: dict[str, Callable] = {}

    def add_instances(self, op_family: str, configs: Sequence) -> None:
        """cf. add_device_operation_instances."""
        self._instances[op_family].extend(configs)

    def set_predicate(self, op_family: str, pred: Callable) -> None:
        """pred(config, *problem) -> bool, cf. IsSupportedArgument."""
        self._predicates[op_family] = pred

    def get_instances(self, op_family: str, *problem) -> list:
        """cf. DeviceOperationInstanceFactory::GetInstances, filtered by the
        supported-predicate when problem dims are given."""
        configs = list(self._instances[op_family])
        pred = self._predicates.get(op_family)
        if pred is not None and problem:
            configs = [c for c in configs if pred(c, *problem)]
        return configs

    def families(self) -> list[str]:
        return sorted(self._instances)


#: global registry (CK's per-op add_device_* externs analog)
registry = InstanceRegistry()


def _register_defaults():
    from composable_kernel_tpu.ops.attention.config import (
        DEFAULT_ATTENTION_CONFIGS,
    )
    from composable_kernel_tpu.ops.gemm.config import (
        DEFAULT_GEMM_CONFIGS,
        GemmConfig,
        is_supported,
    )

    registry.add_instances("gemm", DEFAULT_GEMM_CONFIGS)
    registry.set_predicate("gemm", is_supported)
    registry.add_instances("attention", DEFAULT_ATTENTION_CONFIGS)

    # GEMM-shaped families share the block-config space and predicate (CK
    # likewise instantiates batched/grouped/contraction from the same
    # tile-shape lists, e.g. library/src/.../gpu/batched_gemm/*.cpp).
    for fam in ("batched_gemm", "grouped_gemm", "contraction", "wo_quant_gemm",
                "int8_gemm"):
        registry.add_instances(fam, DEFAULT_GEMM_CONFIGS)
        registry.set_predicate(fam, is_supported)

    # int8 requant instances. Whole-K blocks dominate (round 3: one K step
    # per tile removes the accumulator round-trip — 344 vs 242 TOPS at the
    # 2048x4096x4096 requant shape); k-looped configs stay for K > 16k
    registry.add_instances(
        "int8_gemm",
        [
            GemmConfig(1024, 512, 4096, vmem_limit_mb=80),
            GemmConfig(512, 512, 8192, vmem_limit_mb=80),
            GemmConfig(512, 2048, 1024, vmem_limit_mb=48),
            GemmConfig(512, 1024, 1024, vmem_limit_mb=32),
            GemmConfig(512, 1024, 512),
        ],
    )

    # decode-shape instances for the weight-only path: wide-N single-block
    # configs measured fastest on v5e (whole-N at N<=12k: ~590 GB/s vs ~300
    # for split-N; needs the scoped-VMEM raise; see docs/performance.md)
    registry.add_instances(
        "wo_quant_decode",
        [
            GemmConfig(32, 4096, 1024, vmem_limit_mb=80),
            GemmConfig(32, 6144, 1024, vmem_limit_mb=80),
            GemmConfig(32, 11008, 1024, vmem_limit_mb=80),
            GemmConfig(32, 3584, 1024, vmem_limit_mb=80),
            GemmConfig(32, 7168, 1024, vmem_limit_mb=80),
            GemmConfig(64, 4096, 1024, vmem_limit_mb=80),
            # round-3 N-dividing blocks (a non-dividing block pads the
            # weights per call inside decode loops — indexing.snap_divisor_bn)
            GemmConfig(32, 5504, 1024, vmem_limit_mb=80),
            GemmConfig(32, 2048, 2048, vmem_limit_mb=80),  # deep-K (to 65536)
        ],
    )

    # whole-N prefill instances (93% MXU peak on the W4A16 headline shape;
    # need the scoped-VMEM raise)
    registry.add_instances(
        "wo_quant_gemm",
        [
            GemmConfig(768, 4096, 1024, vmem_limit_mb=64),
            GemmConfig(1280, 4096, 512, vmem_limit_mb=64),
            GemmConfig(768, 2048, 1024, vmem_limit_mb=32),
        ],
    )

    # fp8 ab-scale GEMM: blockwise-scale kernel has its own VMEM profile
    registry.add_instances(
        "fp8_gemm",
        [
            GemmConfig(256, 512, 1024),
            GemmConfig(256, 1024, 512),
            GemmConfig(512, 512, 512),
        ],
    )

    # normalization/softmax row-block instances (rows per grid step)
    registry.add_instances("norm", [256, 512, 1024])
    registry.add_instances("softmax", [256, 512, 1024])


_register_defaults()
