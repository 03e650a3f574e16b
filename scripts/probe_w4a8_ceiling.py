"""Round-5 ceiling isolation for the W4A8 664 GB/s claim (VERDICT r4 #4).

docs/performance.md asserts the W4A8 decode kernel sits at the "int8-MXU
weight-load ceiling": the offset-binary pack forces TWO int8 MXU passes
per packed byte, and 664 GB/s is claimed as the measured MXU weight-load
rate. This probe decomposes that claim with synthetic kernels that strip
one cost at a time, at the decode shape (M=8/32, K=4096, N=11008,
bn=5504, bpk=1024 packed rows per step):

  stream   : DMA the packed stream + one AND + a [1,bn]-accumulated add —
             no MXU. The raw HBM stream rate for this access pattern.
  dots1    : AND-extract + ONE whole-step int8 dot per nibble half
             (2 dots of [m, bpk] x [bpk, bn] per step), int32 accum.
             The bare "two MXU passes per packed byte" rate.
  dots8    : same but split into the production kernel's 8 per-group dots
             (gsz=128) per half, int32 accum, no scales. Isolates the
             group-dot issue cost.
  dots8+s  : dots8 plus the per-group f32 scale-accumulate (the
             production accumulator chain), no rowsum/act-quant/epilogue.
  prod     : the full production w4a8_gemm (fused act-quant, rowsum
             correction, per-token scale) for reference.

CK analog: the dequant-transfer isolation idea of
thread_group_tensor_slice_transfer_v4r1_dequant.hpp — time the transfer
stage alone before blaming the math.

Usage: python scripts/probe_w4a8_ceiling.py
"""

from __future__ import annotations

import functools
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.utils.timing import benchmark_chained


def synth(m, n, k, bn, bpk, mode, gsz=128):
    """One synthetic kernel invocation builder; returns fn(a, b, s)."""
    kp = k // 2  # packed rows
    n_k = kp // bpk
    n_n = n // bn
    s_rows = bpk // gsz

    def kernel(a_ref, b_ref, s_ref, o_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        packed = b_ref[...]
        l8 = packed & jnp.int8(0x0F)
        h16 = packed & jnp.int8(-16)
        if mode == "stream":
            # touch every byte once on the VPU, no MXU: row-reduce the
            # extracted nibbles into the [m, bn] accumulator's first row
            acc_ref[...] += (
                jnp.sum(l8.astype(jnp.int32), axis=0, keepdims=True)
                + jnp.sum(h16.astype(jnp.int32), axis=0, keepdims=True)
            ).astype(jnp.float32)
        elif mode == "dots1":
            a = a_ref[...]
            d = jnp.dot(a, l8, preferred_element_type=jnp.int32) + jnp.dot(
                a, h16, preferred_element_type=jnp.int32
            )
            acc_ref[...] += d.astype(jnp.float32)
        elif mode in ("dots8", "dots8s"):
            a = a_ref[...]
            acc = acc_ref[...]
            for r in range(s_rows):
                ks = slice(r * gsz, (r + 1) * gsz)
                d_lo = jnp.dot(a[:, ks], l8[ks],
                               preferred_element_type=jnp.int32)
                d_hi = jnp.dot(a[:, ks], h16[ks],
                               preferred_element_type=jnp.int32)
                if mode == "dots8s":
                    sl = s_ref[r : r + 1]
                    acc = acc + (d_lo.astype(jnp.float32) * sl
                                 + d_hi.astype(jnp.float32) * sl)
                else:
                    acc = acc + (d_lo + d_hi).astype(jnp.float32)
            acc_ref[...] = acc

        @pl.when(kk == n_k - 1)
        def _fin():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    def fn(a, b, s):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            grid=(1, n_n, n_k),
            in_specs=[
                pl.BlockSpec((m, bpk), lambda mm, nn, kk: (0, kk),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bpk, bn), lambda mm, nn, kk: (kk, nn),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((s_rows, bn), lambda mm, nn, kk: (kk, nn),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m, bn), lambda mm, nn, kk: (0, nn),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((m, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(a, b, s)

    return fn


def main():
    k, n = 4096, 11008
    bn, bpk, gsz = 5504, 1024, 128
    kp = k // 2
    rng = np.random.default_rng(0)
    b_packed = jnp.asarray(rng.integers(-128, 128, (kp, n)), jnp.int8)
    s_full = jnp.asarray(rng.random((kp // gsz, n)), jnp.float32)
    weight_bytes = kp * n  # the packed stream only (scale stream excluded
    # on purpose: the ceiling claim is about the packed-byte rate)

    for m in (8, 32):
        a = jnp.asarray(rng.integers(-127, 128, (m, kp)), jnp.int8)
        print(f"--- M={m} K={k} N={n} bn={bn} bpk={bpk} ---")
        for mode in ("stream", "dots1", "dots8", "dots8s"):
            fn = synth(m, n, k, bn, bpk, mode, gsz)
            try:
                r = benchmark_chained(fn, a, b_packed, s_full,
                                      iters_lo=50, iters_hi=250,
                                      bytes_accessed=float(weight_bytes))
            except Exception as e:
                print(f"{mode:8s}: FAILED {type(e).__name__}: {str(e)[:140]}")
                continue
            print(f"{mode:8s}: {r.avg_ms*1e3:7.1f} us  {r.gbps:6.1f} GB/s "
                  f"packed-stream", flush=True)

        # production kernel reference (fused act-quant serving path)
        from composable_kernel_tpu import dtypes
        from composable_kernel_tpu.ops.quant import w4a8_gemm
        from composable_kernel_tpu.reference.quant import ref_quantize_group

        w = np.asarray(rng.random((k, n)), np.float32) * 0.05
        w_q, scales = ref_quantize_group(jnp.asarray(w), group_size=gsz,
                                         bits=4)
        packed = dtypes.pack_int4_w4a8(w_q, axis=0)
        a_bf = jnp.asarray(rng.random((m, k)), jnp.float32).astype(
            jnp.bfloat16
        )

        def prod(a_, b_, s_):
            return w4a8_gemm(a_, None, b_, s_, group_size=gsz)

        r = benchmark_chained(prod, a_bf, packed, scales, iters_lo=50,
                              iters_hi=250,
                              bytes_accessed=float(packed.size))
        print(f"{'prod':8s}: {r.avg_ms*1e3:7.1f} us  {r.gbps:6.1f} GB/s "
              f"packed-stream", flush=True)


if __name__ == "__main__":
    main()
