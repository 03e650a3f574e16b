"""Probe: int4->bf16 unpack via bitcast magic numbers vs the i32-widen chain.

Round-1 finding (TODO.md): int4 decode weight stream caps at ~520-580 GB/s
(~65% HBM SoL) because the unpack chain (i8->i32 widen, shifts, f32 convert,
scale-mul, bf16 convert) is VPU element-throughput bound at ~0.9 Gvalue/us.

Round-2 candidate (CK FastNumericArrayConverter analog,
element/unary_element_wise_operation.hpp:1061-1094, re-designed for the TPU
VPU): store nibbles offset-binary (m = q + 8), then

    p32 = bitcast(packed_i8_tile, i32)            # 4 bytes/lane, free-ish
    t_q = ((p32 >> s) & 0x000F000F) | 0x43004300   # 2-3 i32 ops / 2 values
    x   = bitcast(t_q, bf16)                       # x = 128 + m exactly
    b   = (x - 136) * scale                        # 2 bf16 ops, exact sub

Zero dtype converts. ~11 i32 ops per 8 values + 2 bf16 ops/value at double
vector width => ~3x fewer VPU slots per value than the widen chain.

Each kernel ends in a full row-sum so no unpack work can be DCE'd.

Probes (real chip):
  P0  bitcast value-mapping sanity (i8->i32->bf16 row interleave)
  P1  throughput of the current widen+convert unpack (baseline)
  P2  throughput of the magic chain, quarters summed (no concat cost)
  P3  throughput of the magic chain with per-subtile concat (dot-ready)
  P4  native jnp.int4 astype(bf16), if the backend supports it
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
import os  # noqa: E402

os.environ["CKT_INTERPRET"] = "0"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from composable_kernel_tpu.utils.timing import benchmark_chained  # noqa: E402

ON_TPU = jax.default_backend() == "tpu"
INTERP = not ON_TPU

ROWS, COLS = 4096, 3584  # packed bytes: 14.7 MB -> 29.4M values
BR = 512  # rows per grid block


# ---------------------------------------------------------------- P0 sanity
def p0():
    def kern32(i8_ref, o32_ref):
        o32_ref[...] = pltpu.bitcast(i8_ref[...], jnp.int32)

    def kernbf(i32_ref, obf_ref):
        obf_ref[...] = pltpu.bitcast(i32_ref[...], jnp.bfloat16)

    m, n = 32, 256
    x = np.arange(m * n, dtype=np.int64).reshape(m, n) % 256 - 128
    x8 = jnp.asarray(x, jnp.int8)
    o32 = pl.pallas_call(
        kern32,
        out_shape=jax.ShapeDtypeStruct((m // 4, n), jnp.int32),
        interpret=INTERP,
    )(x8)
    obf = pl.pallas_call(
        kernbf,
        out_shape=jax.ShapeDtypeStruct((m // 2, n), jnp.bfloat16),
        interpret=INTERP,
    )(o32)
    o32 = np.asarray(o32)
    # reference semantics (jax/_src/pallas/mosaic/primitives.py lowering):
    # i32 row i lane j = bytes rows (4i..4i+3) little-endian
    xb = x.astype(np.uint8).astype(np.uint32)
    ref32 = (
        xb[0::4] | (xb[1::4] << 8) | (xb[2::4] << 16) | (xb[3::4] << 24)
    ).astype(np.int64)
    got = o32.astype(np.int64) & 0xFFFFFFFF
    ok32 = np.array_equal(got, ref32)
    # bf16: i32 row i -> bf16 rows 2i (low half), 2i+1 (high half)
    obf_bits = np.asarray(obf).view(np.uint16)
    lo_ref = (ref32 & 0xFFFF).astype(np.uint16)
    hi_ref = (ref32 >> 16).astype(np.uint16)
    okbf = np.array_equal(obf_bits[0::2], lo_ref) and np.array_equal(
        obf_bits[1::2], hi_ref
    )
    print(f"P0 bitcast semantics: i8->i32 {'OK' if ok32 else 'MISMATCH'}, "
          f"i32->bf16 {'OK' if okbf else 'MISMATCH'}")
    if not (ok32 and okbf):
        print("   got i32 row0[:4]:", got[0, :4], "ref:", ref32[0, :4])
    return ok32 and okbf


def _accumulate(o_ref, partial):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[0:1] += partial.astype(o_ref.dtype)


# -------------------------------------------------------------- P1 baseline
def widen_kernel(b_ref, s_ref, o_ref):
    p = b_ref[...].astype(jnp.int32)
    s = s_ref[0:1]
    lo = (((p << 28) >> 28).astype(jnp.float32) * s).astype(jnp.bfloat16)
    hi = ((p >> 4).astype(jnp.float32) * s).astype(jnp.bfloat16)
    partial = jnp.sum(lo, axis=0, keepdims=True) + jnp.sum(
        hi, axis=0, keepdims=True
    )
    _accumulate(o_ref, partial)


# ------------------------------------------------------- P2/P3 magic chains
MASK = 0x000F000F
MAGIC = 0x43004300


def _quarters(p32):
    mask, magic = jnp.int32(MASK), jnp.int32(MAGIC)
    return [
        pltpu.bitcast(((p32 >> s) & mask) | magic, jnp.bfloat16)
        for s in (0, 4, 8, 12)
    ]


def magic_sum_kernel(b_ref, s_ref, o_ref):
    p32 = pltpu.bitcast(b_ref[...], jnp.int32)
    sb = s_ref[0:1].astype(jnp.bfloat16)
    partial = None
    for q in _quarters(p32):
        d = (q - jnp.bfloat16(136.0)) * sb
        ps = jnp.sum(d, axis=0, keepdims=True)
        partial = ps if partial is None else partial + ps
    _accumulate(o_ref, partial)


def magic_concat_kernel(b_ref, s_ref, o_ref):
    # per 128-byte-row subtile: concat 4 quarters (64 rows each) -> (256, n)
    p32 = pltpu.bitcast(b_ref[...], jnp.int32)
    sb = s_ref[0:1].astype(jnp.bfloat16)
    partial = None
    n_sub = p32.shape[0] // 32  # 32 i32 rows = 128 byte rows per subtile
    for t in range(n_sub):
        sub = p32[t * 32:(t + 1) * 32]
        full = jnp.concatenate(_quarters(sub), axis=0)  # (256, n) bf16
        d = (full - jnp.bfloat16(136.0)) * sb
        ps = jnp.sum(d, axis=0, keepdims=True)
        partial = ps if partial is None else partial + ps
    _accumulate(o_ref, partial)


def i16_chain_kernel(b_ref, s_ref, o_ref):
    # input IS i16 (stored that way in HBM): no input relayout, and
    # i16 -> bf16 bitcast is layout-free (same bit width / tile shape).
    p16 = b_ref[...]
    sb = s_ref[0:1].astype(jnp.bfloat16)
    partial = None
    for s in (0, 4, 8, 12):
        t = ((p16 >> s) & jnp.int16(0x000F)) | jnp.int16(0x4300)
        d = (pltpu.bitcast(t, jnp.bfloat16) - jnp.bfloat16(136.0)) * sb
        ps = jnp.sum(d, axis=0, keepdims=True)
        partial = ps if partial is None else partial + ps
    _accumulate(o_ref, partial)


def i32_native_kernel(b_ref, s_ref, o_ref):
    # input stored as i32 in HBM: magic chain minus the input bitcast
    p32 = b_ref[...]
    sb = s_ref[0:1].astype(jnp.bfloat16)
    partial = None
    for q in _quarters(p32):
        d = (q - jnp.bfloat16(136.0)) * sb
        ps = jnp.sum(d, axis=0, keepdims=True)
        partial = ps if partial is None else partial + ps
    _accumulate(o_ref, partial)


def native_i4_kernel(b_ref, s_ref, o_ref):
    v = b_ref[...].astype(jnp.bfloat16)
    d = v * s_ref[0:1].astype(jnp.bfloat16)
    _accumulate(o_ref, jnp.sum(d, axis=0, keepdims=True))


def run_tp(name, kernel, rows=ROWS, dtype=jnp.int8):
    if dtype in (jnp.int16, jnp.int32):
        bits = jnp.dtype(dtype).itemsize * 8
        x = jnp.asarray(
            np.random.randint(-2 ** (bits - 1), 2 ** (bits - 1),
                              size=(rows, COLS)), dtype)
    else:
        x = jnp.asarray(np.random.randint(-8, 8, size=(rows, COLS)), dtype)
    scale = jnp.ones((8, COLS), jnp.float32)
    nblk = rows // BR

    def fn(xx, ss):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, COLS), jnp.float32),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((BR, COLS), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, COLS), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=INTERP,
        )(xx, ss)

    itemsize = {jnp.int8: 1, jnp.int16: 2, jnp.int32: 4}.get(dtype, 0.5)
    nvals = rows * COLS * 2 * itemsize  # 2 int4 values per packed byte
    nbytes = rows * COLS * itemsize
    if dtype == jnp.int4:
        nvals, nbytes = rows * COLS, rows * COLS * 0.5
    try:
        r = benchmark_chained(fn, x, scale, iters_lo=10, iters_hi=60)
    except Exception as e:
        print(f"{name}: FAILED ({type(e).__name__}: {e})")
        return
    gval = nvals / (r.avg_ms * 1e-3) / 1e9
    gbs = nbytes / (r.avg_ms * 1e-3) / 1e9
    print(f"{name}: {r.avg_ms:.3f} ms  {gval:.1f} Gvalue/s  "
          f"{gbs:.1f} GB/s packed-stream")


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    p0()
    run_tp("P1 widen+convert chain  ", widen_kernel)
    run_tp("P2 magic, quarters-sum  ", magic_sum_kernel)
    run_tp("P3 magic, subtile-concat", magic_concat_kernel)
    try:
        run_tp("P5 i16-native chain    ", i16_chain_kernel,
               rows=ROWS // 2, dtype=jnp.int16)
    except Exception as e:
        print(f"P5 i16 chain: unsupported ({e})")
    try:
        run_tp("P6 i32-native magic    ", i32_native_kernel,
               rows=ROWS // 4, dtype=jnp.int32)
    except Exception as e:
        print(f"P6 i32 native: unsupported ({e})")
    try:
        run_tp("P4 native int4 astype  ", native_i4_kernel,
               rows=ROWS * 2, dtype=jnp.int4)
    except Exception as e:
        print(f"P4 native int4: unsupported ({e})")


if __name__ == "__main__":
    main()
