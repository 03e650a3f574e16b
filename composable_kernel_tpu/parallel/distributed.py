"""Multi-host scaffolding: jax.distributed init + DCN-aware mesh building.

The reference has no multi-device execution at all (SURVEY.md §2.6 — its
whole execution context is one hipStream, `stream_config.hpp:11`); this
module is the TPU-native runway for the 2-host scaling half of the north
star. The contract:

  - data parallelism (and pipeline stages, when used across hosts) ride
    the slow DCN links *between* slices/hosts;
  - tensor/sequence/expert parallelism ride ICI *within* a slice —
    per-token collectives (psum for row-parallel GEMMs, ppermute for the
    ring) must never cross DCN.

``make_hybrid_mesh`` encodes that: DCN-parallel axes are the leading
(slowest-varying) mesh dims over process/slice granularity, ICI axes are
contiguous within a slice. On a single process (this environment, and the
virtual-device CI mesh) it degrades to a plain reshape, so every code
path here is exercisable by the 8-virtual-device dryrun even though a
real 2-host run needs real DCN.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = [
    "init_distributed",
    "make_hybrid_mesh",
    "MeshPlan",
    "auto_mesh_plan",
]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; no-op otherwise.

    Resolution order per argument: explicit parameter, CKT_* env var
    (CKT_COORDINATOR / CKT_NUM_PROCESSES / CKT_PROCESS_ID), cluster
    auto-detection by jax.distributed itself (TPU pods set the metadata
    jax reads natively). Returns True if distributed runtime was (or
    already is) initialized, False for the single-process fallback.

    Safe to call unconditionally at program start: single-process runs
    (including CI's virtual CPU mesh) skip initialization entirely.
    """
    coordinator_address = coordinator_address or os.environ.get("CKT_COORDINATOR")
    if num_processes is None and "CKT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["CKT_NUM_PROCESSES"])
    if process_id is None and "CKT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["CKT_PROCESS_ID"])

    if jax.process_count() > 1:
        return True  # already initialized by a prior call / launcher
    if coordinator_address is None and (num_processes is None or num_processes <= 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


@dataclass(frozen=True)
class MeshPlan:
    """Axis sizes for a hybrid mesh; DCN axes lead, ICI axes trail."""

    dcn: dict[str, int]  # e.g. {"dp": 2} — across hosts/slices
    ici: dict[str, int]  # e.g. {"tp": 4} — within a slice

    @property
    def axis_names(self) -> tuple[str, ...]:
        return tuple(self.dcn) + tuple(self.ici)

    @property
    def n_devices(self) -> int:
        n = 1
        for v in (*self.dcn.values(), *self.ici.values()):
            n *= v
        return n


def _devices_grouped_by_process(devices):
    """Devices ordered process-major, stably within each process."""
    order = sorted(
        range(len(devices)), key=lambda i: (devices[i].process_index, devices[i].id)
    )
    return [devices[i] for i in order]


def make_hybrid_mesh(plan: MeshPlan, devices=None) -> Mesh:
    """Build a Mesh whose DCN axes vary across processes and ICI axes within.

    Multi-process: device order is process-major, so reshaping to
    (*dcn_sizes, *ici_sizes) puts process boundaries exactly at DCN-axis
    boundaries — a collective over any ICI axis stays inside one process's
    devices (one slice), and only DCN axes cross hosts. Requires the
    per-process device count to be divisible by the ICI extent.

    Single-process (virtual CI mesh, one real chip): plain reshape over
    the first n devices — same axis semantics, no host boundary to honor.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = plan.n_devices
    assert len(devices) >= n, (len(devices), plan)
    devices = _devices_grouped_by_process(devices)[:n]

    ici_extent = 1
    for v in plan.ici.values():
        ici_extent *= v
    n_proc = len({d.process_index for d in devices})
    if n_proc > 1:
        per_proc = n // n_proc
        assert per_proc % ici_extent == 0 or ici_extent % per_proc == 0, (
            f"ICI extent {ici_extent} does not tile the {per_proc} "
            f"devices/process — an ICI axis would cross DCN"
        )
    arr = np.array(devices).reshape(
        tuple(plan.dcn.values()) + tuple(plan.ici.values())
    )
    return Mesh(arr, plan.axis_names)


def auto_mesh_plan(
    tp: int | None = None,
    devices=None,
    dp_axis: str = "dp",
    tp_axis: str = "tp",
) -> MeshPlan:
    """Default 2-axis plan: dp across processes (DCN), tp within (ICI).

    With ``tp=None``, tp takes a full process's devices (all-ICI TP, the
    Llama W4A16 serving default) and dp spans processes. Single-process:
    tp defaults to all devices, dp=1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n_proc = len({d.process_index for d in devices}) or 1
    per_proc = len(devices) // n_proc
    if tp is None:
        tp = per_proc
    assert len(devices) % tp == 0, (len(devices), tp)
    dp = len(devices) // tp
    return MeshPlan(dcn={dp_axis: dp}, ici={tp_axis: tp})
