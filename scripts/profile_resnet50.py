"""ResNet-50 op-level conv sweep — script/profile_resnet50.sh analog.

Runs every distinct conv shape of ResNet-50 (the reference sweeps them as
conv_fwd_bias_relu / conv_fwd_bias_relu_add instances) through
``ops.conv.conv_fwd`` with the fused bias+relu (+residual-add) epilogue,
verifies against the pure-jnp reference, and prints CK-style perf lines.

On TPU the conv lowers through XLA's implicit-GEMM path onto the MXU
(SURVEY.md §2: TransformConvFwdToGemm is the compiler's job here); the
sweep is the regression record proving that path holds across the
production shape set.

Usage: python scripts/profile_resnet50.py [--batch 16] [--json out.jsonl]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

# (K, C, Y, X, Hi, Wi, stride, pad, residual_add)
RESNET50_SHAPES = [
    (64, 3, 7, 7, 224, 224, 2, 3, False),
    (64, 64, 1, 1, 56, 56, 1, 0, False),
    (64, 64, 3, 3, 56, 56, 1, 1, False),
    (256, 64, 1, 1, 56, 56, 1, 0, True),
    (64, 256, 1, 1, 56, 56, 1, 0, False),
    (128, 256, 1, 1, 56, 56, 1, 0, False),
    (128, 128, 3, 3, 56, 56, 2, 1, False),
    (512, 128, 1, 1, 28, 28, 1, 0, True),
    (128, 512, 1, 1, 28, 28, 1, 0, False),
    (128, 128, 3, 3, 28, 28, 1, 1, False),
    (256, 512, 1, 1, 28, 28, 1, 0, False),
    (256, 256, 3, 3, 28, 28, 2, 1, False),
    (1024, 256, 1, 1, 14, 14, 1, 0, True),
    (256, 1024, 1, 1, 14, 14, 1, 0, False),
    (256, 256, 3, 3, 14, 14, 1, 1, False),
    (512, 1024, 1, 1, 14, 14, 1, 0, False),
    (512, 512, 3, 3, 14, 14, 2, 1, False),
    (2048, 512, 1, 1, 7, 7, 1, 0, True),
    (512, 2048, 1, 1, 7, 7, 1, 0, False),
    (512, 512, 3, 3, 7, 7, 1, 1, False),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from composable_kernel_tpu.ops.conv import conv_fwd
    from composable_kernel_tpu.reference.conv import ref_conv_fwd
    from composable_kernel_tpu.utils.timing import benchmark_chained

    on_tpu = jax.default_backend() == "tpu"
    n = args.batch if on_tpu else 2
    rows = []
    tf_sum, t_sum = 0.0, 0.0
    for (k_out, c, y, x_f, hi, wi, st, pd, add) in RESNET50_SHAPES:
        if not on_tpu and hi > 56:
            continue
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 4)
        xin = jax.random.normal(ks[0], (n, hi, wi, c), jnp.float32).astype(jnp.bfloat16)
        w = (jax.random.normal(ks[1], (y, x_f, c, k_out), jnp.float32) * 0.1
             ).astype(jnp.bfloat16)
        bias = jax.random.normal(ks[2], (k_out,), jnp.float32)
        ho = (hi + 2 * pd - y) // st + 1
        wo = (wi + 2 * pd - x_f) // st + 1
        resid = (jax.random.normal(ks[3], (n, ho, wo, k_out), jnp.float32)
                 if add else None)
        ds = (bias, resid) if add else (bias,)
        if add:
            c_op = lambda acc, b_, r_: jnp.maximum(acc + b_, 0.0) + r_
        else:
            c_op = lambda acc, b_: jnp.maximum(acc + b_, 0.0)
        kw = dict(strides=(st, st), padding=((pd, pd), (pd, pd)))

        fn = lambda x_, w_: conv_fwd(x_, w_, ds=ds, c_op=c_op, **kw)
        got = np.asarray(fn(xin, w), np.float64)
        ref = np.asarray(
            ref_conv_fwd(xin, w, stride=(st, st), padding=(pd, pd)),
            np.float64,
        ) + np.asarray(bias, np.float64)
        ref = np.maximum(ref, 0.0)
        if add:
            ref = ref + np.asarray(resid, np.float64)
        err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
        assert err < 2e-2, (err, (k_out, c, y, hi, st))

        flops = 2.0 * n * ho * wo * k_out * y * x_f * c
        lo, hi_it = (30, 150) if on_tpu else (2, 4)
        r = benchmark_chained(fn, xin, w, iters_lo=lo, iters_hi=hi_it,
                              flops=flops)
        name = (f"conv{y}x{x_f}_{c}->{k_out}_{hi}x{wi}s{st}"
                + ("_add" if add else ""))
        print(f"Perf: {r.avg_ms:.4f} ms, {r.tflops:.2f} TFlops, "
              f"bias_relu{'_add' if add else ''}, {name} (rel err {err:.1e})",
              flush=True)
        tf_sum += flops
        t_sum += r.avg_ms
        rows.append(dict(name=name, ms=round(r.avg_ms, 4),
                         tflops=round(r.tflops, 2), rel_err=float(err)))

    if t_sum:
        print(f"# resnet50 sweep: {len(rows)} shapes, aggregate "
              f"{tf_sum / (t_sum * 1e-3) / 1e12:.1f} TFlops effective")
    if args.json:
        with open(args.json, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
