"""End-to-end Llama-3-8B W4A16 inference benchmark on one chip.

Builds the full 8B-parameter quantized model (random weights — bandwidth
and compute are weight-value-independent), then measures:

  - single-token decode latency / tokens/s at several batch sizes
  - prefill throughput (tokens/s) at a 2k prompt

Speed-of-light: a decode step must stream every weight once
(~4.2 GB int4 + scales + bf16 embed/head) -> HBM-bound floor.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from composable_kernel_tpu.models import llama
from composable_kernel_tpu.models.llama import random_quantized_params


def main():
    assert jax.default_backend() == "tpu", "run on the real chip"
    quant = "w4a16"
    kv = "bf16"
    for a in sys.argv[1:]:
        if a.startswith("--quant="):
            quant = a.split("=", 1)[1]
        elif a.startswith("--kv="):
            kv = a.split("=", 1)[1]
    print(f"config: quant={quant} kv_quant={kv}", flush=True)
    cfg = llama.llama3_8b(
        max_seq_len=4096, quant=quant, group_size=128, fuse_qkv=True,
        kv_quant=kv,
    )
    print("building 8B quantized params on device ...", flush=True)
    params = jax.jit(lambda k: random_quantized_params(cfg, k))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    n_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)
    )
    print(f"param bytes on HBM: {n_bytes/1e9:.2f} GB", flush=True)

    # ---- decode latency: B slots, positions mid-sequence -----------------
    # Steps are chained inside ONE jit via lax.scan (token feedback,
    # positions advancing) and timed at two step counts: the per-call
    # dispatch through a proxied runtime costs ~40 ms and would otherwise
    # swamp the ~5 ms device step (measured: a python-loop "benchmark"
    # reports 39-45 ms/step regardless of model depth).
    for batch in (1, 4, 8):
        cache = llama.init_kv_cache(cfg, batch)
        toks = jnp.ones((batch, 1), jnp.int32)
        pos0 = jnp.full((batch,), 1024, jnp.int32)

        def run_n(n):
            @jax.jit
            def body(params, cache, toks, pos0):
                def one(carry, i):
                    cache, toks = carry
                    logits, cache = llama.decode_step_batched(
                        params, cache, toks, pos0 + i, cfg
                    )
                    nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
                    return (cache, nxt), ()
                (cache, toks), _ = jax.lax.scan(
                    one, (cache, toks), jnp.arange(n)
                )
                return toks
            return body

        lo_n, hi_n = 8, 40
        lo, hi = run_n(lo_n), run_n(hi_n)
        np.asarray(lo(params, cache, toks, pos0))
        np.asarray(hi(params, cache, toks, pos0))
        t0 = time.perf_counter(); np.asarray(lo(params, cache, toks, pos0)); t_lo = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(hi(params, cache, toks, pos0)); t_hi = time.perf_counter() - t0
        dt = (t_hi - t_lo) / (hi_n - lo_n)
        print(
            f"decode B={batch}: {dt*1e3:.2f} ms/step, "
            f"{batch/dt:.1f} tok/s total, {1/dt:.1f} tok/s/seq",
            flush=True,
        )
        del cache

    # ---- prefill throughput ---------------------------------------------
    s = 2048
    prompt = jnp.ones((1, s), jnp.int32)
    fwd = jax.jit(lambda p, t: llama.forward(p, t, cfg))
    logits = fwd(params, prompt)
    np.asarray(logits[0, -1, :8])
    t0 = time.perf_counter()
    logits = fwd(params, prompt)
    np.asarray(logits[0, -1, :8])
    dt = time.perf_counter() - t0
    print(f"prefill {s} tokens: {dt*1e3:.1f} ms, {s/dt:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
