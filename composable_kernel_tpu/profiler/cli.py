"""ckprof — the profiler / autotuning CLI.

TPU re-design of CK's ``ckProfiler`` (SURVEY.md §3.3):

  - self-registering op table (``profiler_operation_registry.hpp:12-79``,
    ``REGISTER_PROFILER_OPERATION``) -> the ``@register`` decorator
  - per-op engines (``profiler/include/profiler/profile_*_impl.hpp``): run
    every supported instance, verify against the host reference, time with
    CK's warmup+repeat discipline, report best TFlops/GB/s + instance name
    (``profile_gemm_impl.hpp:140-220``)
  - CLI shape args like ``ckprof gemm -m 3840 -n 4096 -k 4096 --dtype bf16``
    (CK: positional M N K strides; we use flags)

Timing uses the chained-slope harness on TPU (honest under a proxied
runtime) and falls back to wall-clock on CPU interpret mode.
"""

from __future__ import annotations

import argparse
import sys

OPERATIONS = {}

#: rows collected during this invocation, written by --csv/--json. This is
#: the per-round regression-tracking output (CK analog: the SQL-backed perf
#: CI fed by script/process_perf_data.py:239) — diff two rounds' files to
#: see per-instance movement.
RESULTS: list[dict] = []
_CONTEXT: dict = {}


def set_context(**kw):
    _CONTEXT.clear()
    _CONTEXT.update(kw)


def record(instance, r, ok=True, **extra):
    """Append one machine-readable perf row (and return it)."""
    row = {
        **_CONTEXT,
        "instance": instance,
        "avg_ms": round(r.avg_ms, 5),
        "tflops": round(r.tflops, 3),
        "gbps": round(r.gbps, 2),
        "verified": bool(ok),
        **extra,
    }
    RESULTS.append(row)
    return row


def write_results(csv_path=None, json_path=None):
    if not RESULTS:
        return
    keys = ["op", "instance", "m", "n", "k", "dtype", "avg_ms", "tflops",
            "gbps", "verified"]
    extra_keys = sorted({k for row in RESULTS for k in row} - set(keys))
    keys += extra_keys
    if csv_path:
        import csv as _csv

        with open(csv_path, "a", newline="") as f:
            w = _csv.DictWriter(f, fieldnames=keys, restval="")
            if f.tell() == 0:
                w.writeheader()
            for row in RESULTS:
                w.writerow(row)
    if json_path:
        import json as _json

        with open(json_path, "a") as f:
            for row in RESULTS:
                f.write(_json.dumps(row) + "\n")


def register(name):
    def deco(fn):
        OPERATIONS[name] = fn
        return fn

    return deco


def _env():
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the environment's sitecustomize pins the TPU plugin via
        # jax.config, so the env var alone does not win — honor it
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    return jax, jnp, on_tpu


def _time(fn, a, *rest, flops, on_tpu):
    from composable_kernel_tpu.utils.timing import benchmark, benchmark_chained

    if on_tpu:
        return benchmark_chained(fn, a, *rest, iters_lo=20, iters_hi=100, flops=flops)
    return benchmark(lambda: fn(a, *rest), warmup=1, iters=3, flops=flops)


def _report(rows, best):
    for name, r, ok in rows:
        flag = "OK " if ok else "FAIL"
        print(f"  [{flag}] {name:40s} {r.avg_ms:9.4f} ms  {r.tflops:8.2f} TFlops")
        record(name, r, ok)
    if best:
        name, r, _ = best
        print(f"Best Perf: {r.avg_ms:.4f} ms, {r.tflops:.2f} TFlops, {name}")


def _run_instances(configs, make_fn, args_tuple, want, check, flops, on_tpu):
    import numpy as np

    rows, best = [], None
    for cfg in configs:
        fn = make_fn(cfg)
        try:
            out = fn(*args_tuple)
            ok = True
            if want is not None:
                try:
                    check(np.asarray(out, np.float64), want)
                except AssertionError as e:
                    ok = False
                    print(f"  verify fail {cfg.name()}: {e}", file=sys.stderr)
            r = _time(fn, *args_tuple, flops=flops, on_tpu=on_tpu)
        except Exception as e:
            print(f"  skip {cfg.name()}: {type(e).__name__}: {e}", file=sys.stderr)
            continue
        rows.append((cfg.name(), r, ok))
        if ok and (best is None or r.avg_ms < best[1].avg_ms):
            best = rows[-1]
    _report(rows, best)
    return best


def _check_rel(tol):
    import numpy as np

    def check(out, want):
        err = np.abs(out - want).max()
        scale = max(np.abs(want).max(), 1e-9)
        assert err / scale < tol, f"rel err {err / scale:.3e} > {tol}"

    return check


@register("gemm")
def profile_gemm(ns):
    jax, jnp, on_tpu = _env()
    import numpy as np

    from composable_kernel_tpu.ops.gemm.config import is_supported
    from composable_kernel_tpu.ops.gemm.kernel import pallas_gemm
    from composable_kernel_tpu.tuning.registry import registry

    dt = {"bf16": jnp.bfloat16, "f16": jnp.float16, "f32": jnp.float32}[ns.dtype]
    m, n, k = ns.m, ns.n, ns.k
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32).astype(dt)
    b = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32).astype(dt)
    want = None
    if ns.verify:
        want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    cfgs = registry.get_instances("gemm", m, n, k)
    print(f"gemm {ns.dtype} {m}x{n}x{k}: {len(cfgs)} instances")
    _run_instances(
        cfgs,
        lambda cfg: (lambda a_, b_: pallas_gemm(a_, b_, config=cfg, interpret=not on_tpu)),
        (a, b),
        want,
        _check_rel(0.02 if ns.dtype != "f32" else 1e-4),
        2.0 * m * n * k,
        on_tpu,
    )


@register("wo_quant_gemm")
def profile_wo_quant_gemm(ns):
    jax, jnp, on_tpu = _env()
    import numpy as np

    from composable_kernel_tpu import dtypes
    from composable_kernel_tpu.ops.gemm.config import is_supported
    from composable_kernel_tpu.ops.quant import dequant_gemm
    from composable_kernel_tpu.reference.quant import (
        ref_quantize_group,
        ref_quantize_per_channel,
    )
    from composable_kernel_tpu.tuning.registry import registry

    m, n, k = ns.m, ns.n, ns.k
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32)
    int4 = ns.wdtype == "i4"
    if ns.group:
        w_q, s = ref_quantize_group(w, ns.group, bits=4 if int4 else 8)
        g = ns.group
    else:
        w_q, s = ref_quantize_per_channel(w, bits=4 if int4 else 8)
        g = None
    b_q = dtypes.pack_int4(w_q, axis=0) if int4 else w_q
    want = None
    if ns.verify:
        wdq = np.asarray(w_q, np.float64)
        s64 = np.asarray(s, np.float64)
        wdq = wdq * (s64[None, :] if g is None else np.repeat(s64, g, axis=0))
        want = np.asarray(a, np.float64) @ wdq
    cfgs = registry.get_instances("gemm", m, n, k)
    print(f"wo_quant_gemm bf16x{ns.wdtype} g={g or 'chan'} {m}x{n}x{k}: "
          f"{len(cfgs)} instances")
    _run_instances(
        cfgs,
        lambda cfg: (
            lambda a_, b_, s_: dequant_gemm(
                a_, b_, s_, group_size=g, packed_int4=int4, config=cfg,
                interpret=not on_tpu,
            )
        ),
        (a, b_q, s),
        want,
        _check_rel(0.02),
        2.0 * m * n * k,
        on_tpu,
    )


@register("w4a8_gemm")
def profile_w4a8_gemm(ns):
    """INT4-weight x per-token-INT8-activation GEMM on the int8 MXU
    (ops/quant/w4a8.py; the per-instance sweep for the AND-only unpack
    kernel). Verification: host f64 on exact integer dots."""
    jax, jnp, on_tpu = _env()
    import numpy as np

    from composable_kernel_tpu import dtypes
    from composable_kernel_tpu.ops.quant import quantize_act_token, w4a8_gemm
    from composable_kernel_tpu.reference.quant import ref_quantize_group
    from composable_kernel_tpu.tuning.registry import registry

    m, n, k = ns.m, ns.n, ns.k
    g = ns.group or 128
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.1
    a_q, a_s = quantize_act_token(a)
    w_q, s = ref_quantize_group(w, g, bits=4)
    packed = dtypes.pack_int4_w4a8(w_q, axis=0)
    want = None
    if ns.verify:
        aq = np.asarray(a_q, np.int64)
        wq = np.asarray(w_q, np.int64)
        dots = np.einsum(
            "mgk,gkn->gmn", aq.reshape(m, k // g, g), wq.reshape(k // g, g, n)
        )
        want = (dots.astype(np.float64) * np.asarray(s, np.float64)[:, None, :]
                ).sum(0) * np.asarray(a_s, np.float64).reshape(-1, 1)
    cfgs = registry.get_instances("gemm", m, n, k)
    print(f"w4a8_gemm i8xi4 g={g} {m}x{n}x{k}: {len(cfgs)} instances")
    _run_instances(
        cfgs,
        lambda cfg: (
            lambda aq_, as_, b_, s_: w4a8_gemm(
                aq_, as_, b_, s_, group_size=g, config=cfg,
                out_dtype=jnp.float32, interpret=not on_tpu,
            )
        ),
        (a_q, a_s, packed, s),
        want,
        _check_rel(1e-3),
        2.0 * m * n * k,
        on_tpu,
    )


@register("w8a8_gemm")
def profile_w8a8_gemm(ns):
    """Per-channel INT8 weight x per-token INT8 activation GEMM (the
    SmoothQuant-style dynamic path, ops/quant/w4a8.py::w8a8_gemm).
    Verification: host f64 on exact integer dots."""
    jax, jnp, on_tpu = _env()
    import numpy as np

    from composable_kernel_tpu.ops.quant import quantize_act_token, w8a8_gemm
    from composable_kernel_tpu.reference.quant import ref_quantize_per_channel
    from composable_kernel_tpu.tuning.registry import registry

    m, n, k = ns.m, ns.n, ns.k
    a = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.float32) * 0.1
    a_q, a_s = quantize_act_token(a)
    w_q, s = ref_quantize_per_channel(w, bits=8)
    want = None
    if ns.verify:
        acc = np.asarray(a_q, np.int64) @ np.asarray(w_q, np.int64)
        want = (acc.astype(np.float64) * np.asarray(s, np.float64)[None, :]
                ) * np.asarray(a_s, np.float64).reshape(-1, 1)
    cfgs = registry.get_instances("int8_gemm", m, n, k)
    print(f"w8a8_gemm i8xi8 {m}x{n}x{k}: {len(cfgs)} instances")
    _run_instances(
        cfgs,
        lambda cfg: (
            lambda aq_, as_, b_, s_: w8a8_gemm(
                aq_, as_, b_, s_, config=cfg,
                out_dtype=jnp.float32, interpret=not on_tpu,
            )
        ),
        (a_q, a_s, w_q, s),
        want,
        _check_rel(1e-4),
        2.0 * m * n * k,
        on_tpu,
    )


@register("attention")
def profile_attention(ns):
    jax, jnp, on_tpu = _env()
    import numpy as np

    from composable_kernel_tpu.ops.attention import (
        DEFAULT_ATTENTION_CONFIGS,
        flash_attention,
    )

    b, hq, hkv, sq, sk, d = ns.batch, ns.heads, ns.kv_heads or ns.heads, ns.m, ns.n, ns.k
    q = jax.random.normal(jax.random.PRNGKey(0), (b, hq, sq, d), jnp.float32).astype(jnp.bfloat16)
    kk = jax.random.normal(jax.random.PRNGKey(1), (b, hkv, sk, d), jnp.float32).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, hkv, sk, d), jnp.float32).astype(jnp.bfloat16)
    flops = 4.0 * b * hq * sq * sk * d * (0.5 if ns.causal else 1.0)
    want = None
    if ns.verify:
        from composable_kernel_tpu.reference.attention import ref_attention

        want = np.asarray(
            ref_attention(q, kk, v, causal=ns.causal, out_dtype=jnp.float32),
            np.float64,
        )
    print(f"attention B{b} Hq{hq} Hkv{hkv} Sq{sq} Sk{sk} D{d} causal={ns.causal}: "
          f"{len(DEFAULT_ATTENTION_CONFIGS)} instances")
    _run_instances(
        DEFAULT_ATTENTION_CONFIGS,
        lambda cfg: (
            lambda q_, k_, v_: flash_attention(
                q_, k_, v_, causal=ns.causal, config=cfg, interpret=not on_tpu
            )
        ),
        (q, kk, v),
        want,
        _check_rel(0.03),
        flops,
        on_tpu,
    )


@register("softmax")
def profile_softmax(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.normalization import softmax
    from composable_kernel_tpu.utils.timing import BenchResult

    x = jax.random.normal(jax.random.PRNGKey(0), (ns.m, ns.n), jnp.float32)
    fn = lambda x_: softmax(x_, interpret=not on_tpu)
    r = _time(fn, x, flops=0, on_tpu=on_tpu)
    gb = 2 * x.size * 4 / 1e9
    print(f"softmax {ns.m}x{ns.n}: {r.avg_ms:.4f} ms, "
          f"{gb / (r.avg_ms / 1e3):.1f} GB/s")


@register("layernorm")
def profile_layernorm(ns):
    jax, jnp, on_tpu = _env()
    from composable_kernel_tpu.ops.normalization import layernorm

    x = jax.random.normal(jax.random.PRNGKey(0), (ns.m, ns.n), jnp.float32)
    g = jnp.ones((ns.n,), jnp.float32)
    b = jnp.zeros((ns.n,), jnp.float32)
    fn = lambda x_, g_, b_: layernorm(x_, g_, b_, interpret=not on_tpu)
    r = _time(fn, x, g, b, flops=0, on_tpu=on_tpu)
    gb = 2 * x.size * 4 / 1e9
    print(f"layernorm {ns.m}x{ns.n}: {r.avg_ms:.4f} ms, "
          f"{gb / (r.avg_ms / 1e3):.1f} GB/s")


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="ckprof",
        description="composable_kernel_tpu profiler (CK ckProfiler analog)",
    )
    p.add_argument("op", choices=sorted(OPERATIONS))
    p.add_argument("-m", type=int, default=3840)
    p.add_argument("-n", type=int, default=4096)
    p.add_argument("-k", type=int, default=4096)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f16", "f32"])
    p.add_argument("--wdtype", default="i8", choices=["i8", "i4"],
                   help="weight dtype for wo_quant_gemm")
    p.add_argument("--group", type=int, default=None,
                   help="group size for wo_quant_gemm (default per-channel)")
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--kv-heads", type=int, default=None, dest="kv_heads")
    p.add_argument("--causal", action="store_true")
    p.add_argument("--no-verify", dest="verify", action="store_false")
    p.add_argument("--csv", default=None,
                   help="append per-instance rows to this CSV (perf-CI log)")
    p.add_argument("--json", default=None, dest="json_out",
                   help="append per-instance rows to this JSONL file")
    ns = p.parse_args(argv)
    set_context(op=ns.op, m=ns.m, n=ns.n, k=ns.k, dtype=ns.dtype)
    OPERATIONS[ns.op](ns)
    write_results(ns.csv, ns.json_out)


if __name__ == "__main__":
    main()
