"""Multi-host Llama W4A16 decode scaling benchmark (BASELINE: >=85%
tokens/s scaling 1 -> 2 hosts).

Run the same command on every host (or once for the single-host leg):

    CKT_COORDINATOR=host0:1234 CKT_NUM_PROCESSES=2 CKT_PROCESS_ID=<i> \
        python scripts/bench_multihost.py --tp 4

Design: tp rides ICI within each host's slice (per-token psum stays off
DCN), dp spans hosts over DCN — each host decodes an independent request
batch, so the only cross-host traffic is control. Scaling efficiency =
total tok/s at N hosts / (N x single-host tok/s). This environment has
one chip behind a tunnel, so only the single-process leg can execute
here; the multi-process path is the same code under jax.distributed
(exercised structurally by the CI virtual mesh + dryrun).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, default=None,
                    help="ICI tensor-parallel degree (default: all local devices)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--baseline-tok-s", type=float, default=None,
                    help="single-host tok/s for the efficiency ratio")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from composable_kernel_tpu.models import llama
    from composable_kernel_tpu.parallel import (
        auto_mesh_plan,
        init_distributed,
        make_hybrid_mesh,
        shard_params,
        tp_decode_step,
    )

    multi = init_distributed()
    plan = auto_mesh_plan(tp=args.tp)
    mesh = make_hybrid_mesh(plan)
    n_hosts = jax.process_count()
    print(f"processes={n_hosts} plan={plan} mesh={mesh.shape}")

    if mesh.shape["tp"] > 1 or mesh.shape["dp"] > 1:
        cfg = llama.llama3_8b(max_seq_len=2048, quant="w4a16", group_size=128,
                              tp_pack=mesh.shape["tp"])
    else:
        cfg = llama.llama3_8b(max_seq_len=2048, quant="w4a16", group_size=128)
    params = jax.jit(lambda k: llama.random_quantized_params(cfg, k))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    if mesh.shape["tp"] > 1:
        params = shard_params(params, cfg, mesh)

    b = args.batch * mesh.shape["dp"]
    cache = llama.init_kv_cache(cfg, b)
    toks = jnp.ones((b, 1), jnp.int32)

    def run(n):
        @jax.jit
        def body(p, c, t):
            def one(carry, i):
                c, t = carry
                if mesh.shape["tp"] > 1:
                    logits, c = tp_decode_step(p, c, t, 0, cfg, mesh)
                else:
                    logits, c = llama.decode_step_batched(
                        p, c, t, jnp.full((b,), i, jnp.int32), cfg
                    )
                nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                return (c, nxt), ()

            (c, t), _ = jax.lax.scan(one, (c, t), jnp.arange(n))
            return t

        t0 = time.perf_counter()
        np.asarray(body(params, cache, toks))
        return time.perf_counter() - t0

    run(2)  # compile
    lo, hi = 8, args.steps
    dt = (run(hi) - run(lo)) / (hi - lo)
    tok_s = b / dt
    line = {"hosts": n_hosts, "batch": b, "ms_per_step": round(dt * 1e3, 2),
            "tok_s": round(tok_s, 1)}
    if args.baseline_tok_s:
        line["scaling_efficiency"] = round(
            tok_s / (n_hosts * args.baseline_tok_s), 3
        )
    import json

    print(json.dumps(line))


if __name__ == "__main__":
    main()
