"""W4A8 decode/prefill benchmark on the real chip.

The W4A16 int4 decode path is capped at ~545-590 GB/s by the VPU
i32-widen unpack chain (docs/performance.md). The W4A8 kernel
(ops/quant/w4a8.py) replaces that chain with two int8 ANDs + int8 MXU
dots. This script (a) verifies the kernel on-chip against the jnp
reference, (b) sweeps decode shapes for weight-stream GB/s vs the W4A16
kernel, (c) measures prefill TOPs.

Run: python scripts/bench_w4a8.py [--quick]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
import os  # noqa: E402

os.environ["CKT_INTERPRET"] = "0"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from composable_kernel_tpu import dtypes  # noqa: E402
from composable_kernel_tpu.ops.quant import (  # noqa: E402
    dequant_gemm,
    quantize_act_token,
    w4a8_gemm,
)
from composable_kernel_tpu.reference import quant as rq  # noqa: E402
from composable_kernel_tpu.utils.timing import benchmark_chained  # noqa: E402

QUICK = "--quick" in sys.argv


def verify():
    m, n, k, g = 16, 512, 1024, 128
    key = jax.random.PRNGKey(0)
    ka, kw = jax.random.split(key)
    a = jax.random.normal(ka, (m, k), jnp.float32)
    w = jax.random.normal(kw, (k, n), jnp.float32) * 0.1
    a_q, a_s = quantize_act_token(a)
    w_q, w_s = rq.ref_quantize_group(w, group_size=g, bits=4)
    packed = dtypes.pack_int4_w4a8(w_q)
    got = np.asarray(
        w4a8_gemm(a_q, a_s, packed, w_s, group_size=g, out_dtype=jnp.float32)
    )
    want = np.asarray(
        rq.ref_w4a8_gemm(a_q, a_s, w_q, w_s, group_size=g, out_dtype=jnp.float32)
    )
    rel = np.abs(got - want) / (np.abs(want) + 1e-4)
    print(f"verify on-chip: max rel err {rel.max():.2e}", flush=True)
    assert rel.max() < 1e-3, rel.max()


def bench_decode(m, n, k, g=128):
    key = jax.random.PRNGKey(1)
    ka, kw = jax.random.split(key)
    a = jax.random.normal(ka, (m, k), jnp.float32)
    wq = jax.random.randint(kw, (k, n), -8, 8, jnp.int8)
    ws = jnp.abs(jax.random.normal(kw, (k // g, n), jnp.float32)) * 0.01 + 0.005
    a_q, a_s = quantize_act_token(a)
    a16 = a.astype(jnp.bfloat16)

    pk_w4a8 = dtypes.pack_int4_w4a8(wq)
    pk_w4a16 = dtypes.pack_int4(wq)
    wbytes = float(pk_w4a8.size + ws.size * 4)

    # chained-slope timing through fn(a, *rest) signatures
    r8i = benchmark_chained(
        lambda aq: w4a8_gemm(aq, a_s, pk_w4a8, ws, group_size=g, offset_corr="inline"),
        a_q,
        bytes_accessed=wbytes,
    )
    r8e = benchmark_chained(
        lambda aq: w4a8_gemm(aq, a_s, pk_w4a8, ws, group_size=g, offset_corr="external"),
        a_q,
        bytes_accessed=wbytes,
    )
    r16 = benchmark_chained(
        lambda ab: dequant_gemm(ab, pk_w4a16, ws, group_size=g, packed_int4=True),
        a16,
        bytes_accessed=wbytes,
    )
    best = min(r8i.avg_ms, r8e.avg_ms)
    print(
        f"decode M={m:3d} N={n:5d} K={k}: W4A8 inl {r8i.gbps:7.1f} "
        f"ext {r8e.gbps:7.1f} GB/s | W4A16 {r16.gbps:7.1f} GB/s "
        f"speedup {r16.avg_ms / best:.2f}x",
        flush=True,
    )
    return r8i, r16


def bench_prefill(m, n, k, g=128):
    key = jax.random.PRNGKey(2)
    ka, kw = jax.random.split(key)
    a = jax.random.normal(ka, (m, k), jnp.float32)
    wq = jax.random.randint(kw, (k, n), -8, 8, jnp.int8)
    ws = jnp.abs(jax.random.normal(kw, (k // g, n), jnp.float32)) * 0.01 + 0.005
    a_q, a_s = quantize_act_token(a)
    a16 = a.astype(jnp.bfloat16)
    pk_w4a8 = dtypes.pack_int4_w4a8(wq)
    pk_w4a16 = dtypes.pack_int4(wq)
    fl = 2.0 * m * n * k
    r8i = benchmark_chained(
        lambda aq: w4a8_gemm(aq, a_s, pk_w4a8, ws, group_size=g, offset_corr="inline"),
        a_q, flops=fl,
    )
    r16 = benchmark_chained(
        lambda ab: dequant_gemm(ab, pk_w4a16, ws, group_size=g, packed_int4=True),
        a16,
        flops=fl,
    )
    print(
        f"prefill M={m} N={n} K={k}: W4A8 inl {r8i.tflops:6.1f} TOPs | "
        f"W4A16 {r16.tflops:6.1f} TF  speedup {r16.avg_ms / r8i.avg_ms:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    verify()
    shapes = [(8, 11008, 4096)] if QUICK else [
        (1, 11008, 4096),
        (8, 11008, 4096),
        (16, 11008, 4096),
        (32, 11008, 4096),
        (64, 11008, 4096),
        (8, 4096, 4096),
        (8, 14336, 4096),
        (8, 4096, 11008),
    ]
    for m, n, k in shapes:
        bench_decode(m, n, k)
    if not QUICK:
        bench_prefill(3840, 4096, 4096)
        bench_prefill(2048, 4096, 4096)
