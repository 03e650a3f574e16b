"""Probe: what bounds W4A8 decode at ~588 GB/s — MXU weight-load or VPU?

Variants (all same DMA traffic; results intentionally wrong where noted):
  P1  full kernel (baseline)
  P2  lo-dot only: ANDs both nibbles but issues HALF the int8 MXU dots.
      If time drops toward the DMA floor -> the int8 MXU's weight-load
      rate is the binding constraint (2 values/byte through the array).
  P3  no scale-accumulate: int32 accumulate only, one scale at the end
      (wrong math) — isolates the per-group f32 [bm, bn] passes.
  P4  dense int8 GEMM at the same VALUE count (b int8 [K, N] full) —
      the MXU's own B-load rate with DMA twice as heavy.
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")
import os  # noqa: E402

os.environ["CKT_INTERPRET"] = "0"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from composable_kernel_tpu.utils.timing import benchmark_chained  # noqa: E402

M, N, K, G = 8, 11008, 4096, 128
BM, BPK = 32, 1024
S_ROWS = BPK // G


def make_kernel(mode):
    def kern(a_lo_ref, a_hi_ref, b_ref, s_ref, o_ref, acc_ref):
        kk = pl.program_id(0)

        @pl.when(kk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        packed = b_ref[...]
        l8 = packed & jnp.int8(0x0F)
        h16 = packed & jnp.int8(-16)
        a_lo = a_lo_ref[...]
        a_hi = a_hi_ref[...]
        acc = acc_ref[...]
        if mode == "noscale":
            d = jnp.dot(a_lo, l8, preferred_element_type=jnp.int32)
            d = d + jnp.dot(a_hi, h16, preferred_element_type=jnp.int32)
            acc = acc + d.astype(jnp.float32)
        else:
            for r in range(S_ROWS):
                ks = slice(r * G, (r + 1) * G)
                sl = s_ref[r : r + 1]
                d = jnp.dot(a_lo[:, ks], l8[ks], preferred_element_type=jnp.int32)
                if mode == "full":
                    d = d + jnp.dot(a_hi[:, ks], h16[ks], preferred_element_type=jnp.int32)
                acc = acc + d.astype(jnp.float32) * sl
        acc_ref[...] = acc

        @pl.when(kk == (K // 2) // BPK - 1)
        def _fin():
            o_ref[...] = acc_ref[...].astype(jnp.bfloat16)

    return kern


def run_variant(mode, a_q, packed, scales):
    n_steps = (K // 2) // BPK
    grid = (n_steps,)
    out = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((BM, N), jnp.bfloat16),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BM, BPK), lambda kk: (0, kk), memory_space=pltpu.VMEM),
                pl.BlockSpec((BM, BPK), lambda kk: (0, kk + n_steps), memory_space=pltpu.VMEM),
                pl.BlockSpec((BPK, N), lambda kk: (kk, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, N), lambda kk: (kk, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, N), lambda kk: (0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((BM, N), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(a_q, a_q, packed, scales)
    return out


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    a_q = jax.random.randint(key, (BM, K), -127, 128, jnp.int8)
    packed = jax.random.randint(key, (K // 2, N), -128, 128, jnp.int8)
    n_steps = (K // 2) // BPK
    scales = jnp.ones((n_steps * 8, N), jnp.float32) * 0.01
    wbytes = float(packed.size)

    for mode in ("full", "lo_only", "noscale"):
        r = benchmark_chained(
            lambda aq, m=mode: run_variant(m, aq, packed, scales),
            a_q, bytes_accessed=wbytes,
        )
        print(f"{mode:8s}: {r.avg_ms * 1e3:7.1f} us  {r.gbps:7.1f} GB/s packed-stream",
              flush=True)

    # P4: dense int8 GEMM, same value count, 2x bytes
    from composable_kernel_tpu.ops.gemm.api import gemm as pallas_gemm_api
    from composable_kernel_tpu.ops.gemm.config import GemmConfig

    b_full = jax.random.randint(key, (K, N), -128, 128, jnp.int8)
    cfg = GemmConfig(32, N, 1024, vmem_limit_mb=100)
    r = benchmark_chained(
        lambda aq: pallas_gemm_api(aq, b_full, config=cfg, out_dtype=jnp.int32),
        a_q, bytes_accessed=float(b_full.size),
    )
    print(f"dense i8: {r.avg_ms * 1e3:7.1f} us  {r.gbps:7.1f} GB/s B-stream "
          f"({r.gbps:7.1f} Mvalue/us-equiv)", flush=True)


if __name__ == "__main__":
    main()
