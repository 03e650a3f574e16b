"""Additional ckprof engines: conv, grouped GEMM, reduce, pool.

Completes the profiler surface toward ckProfiler's 60 front-ends
(profiler/src/profile_*.cpp): each engine runs, verifies against the host
reference, and reports a CK-style perf line.
"""

from __future__ import annotations

import numpy as np

from composable_kernel_tpu.profiler.cli import OPERATIONS, _env, _time, register


@register("conv_fwd")
def profile_conv_fwd(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.conv import conv_fwd
    from composable_kernel_tpu.reference.conv import ref_conv_fwd

    n, hw, c, k_out = (ns.batch, 56, 128, 256) if on_tpu else (2, 14, 16, 32)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, hw, hw, c), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, k_out), jnp.float32).astype(jnp.bfloat16)
    flops = 2.0 * n * hw * hw * k_out * 9 * c
    fn = lambda x_, w_: conv_fwd(x_, w_, padding=((1, 1), (1, 1)))
    out = fn(x, w)
    ref = np.asarray(ref_conv_fwd(x, w, padding=(1, 1)), np.float64)
    err = np.abs(np.asarray(out, np.float64) - ref).max() / max(np.abs(ref).max(), 1e-9)
    r = _time(fn, x, w, flops=flops, on_tpu=on_tpu)
    print(f"conv_fwd {n}x{hw}x{hw}x{c}->{k_out}: {r.avg_ms:.4f} ms "
          f"{r.tflops:.2f} TFlops (rel err {err:.2e})")


@register("grouped_gemm")
def profile_grouped_gemm(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.gemm.api import grouped_gemm

    from composable_kernel_tpu.ops.gemm.config import GemmConfig

    g, m_per, k, n = (8, 256, 1024, 1024) if on_tpu else (4, 32, 128, 128)
    a = jax.random.normal(jax.random.PRNGKey(0), (g * m_per, k), jnp.float32).astype(jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (g, k, n), jnp.float32).astype(jnp.bfloat16)
    sizes = jnp.full((g,), m_per, jnp.int32)
    # ragged contract: group sizes must be multiples of block_m
    cfg = GemmConfig(block_m=min(m_per, 128), block_n=512, block_k=512)
    fn = lambda a_, b_: grouped_gemm(sizes, a_, b_, config=cfg)
    out = np.asarray(fn(a, b), np.float64)
    want = np.concatenate([
        np.asarray(a[i * m_per : (i + 1) * m_per], np.float64)
        @ np.asarray(b[i], np.float64)
        for i in range(g)
    ])
    err = np.abs(out - want).max() / max(np.abs(want).max(), 1e-9)
    r = _time(fn, a, b, flops=2.0 * g * m_per * k * n, on_tpu=on_tpu)
    print(f"grouped_gemm G{g} {m_per}x{n}x{k}: {r.avg_ms:.4f} ms "
          f"{r.tflops:.2f} TFlops (rel err {err:.2e})")


@register("reduce")
def profile_reduce(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.reduction import reduce as ckt_reduce

    rows, cols = (8192, 8192) if on_tpu else (256, 256)
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, cols), jnp.float32)
    fn = lambda x_: ckt_reduce(x_, (1,), "add")
    r = _time(fn, x, flops=0, on_tpu=on_tpu)
    gb = x.size * 4 / 1e9
    print(f"reduce add {rows}x{cols}: {r.avg_ms:.4f} ms, "
          f"{gb / (r.avg_ms / 1e3):.1f} GB/s")


@register("pool")
def profile_pool(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.pool import max_pool

    n, hw, c = (8, 112, 128) if on_tpu else (2, 16, 16)
    x = jax.random.normal(jax.random.PRNGKey(0), (n, hw, hw, c), jnp.float32)
    fn = lambda x_: max_pool(x_, (2, 2))
    r = _time(fn, x, flops=0, on_tpu=on_tpu)
    gb = x.size * 4 / 1e9
    print(f"max_pool2x2 {n}x{hw}x{hw}x{c}: {r.avg_ms:.4f} ms, "
          f"{gb / (r.avg_ms / 1e3):.1f} GB/s")
