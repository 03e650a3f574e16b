"""Packed vs padded chunked-prefill wave on the real chip.

The padded chunk wave steps EVERY wave slot through ceil(max_len/c)
rounds; the packed wave (prefill_chunk_step_packed) runs only the live
entries of each round. This probe times one round at each live-entry
count with the carried-cache chained loop (slope timing, tunnel-honest)
and integrates both schedules over a mixed-length admission wave.

Run: CKT_INTERPRET=0 python scripts/probe_packed_chunk_wave.py
"""

import sys
import time

sys.path.insert(0, ".")

import os

os.environ.setdefault("CKT_INTERPRET", "0")

import jax
import jax.numpy as jnp
import numpy as np

from composable_kernel_tpu.models import llama

C = 512
BW = 8
LENS = [4096, 2048, 2048, 1024, 1024, 512, 512, 512]  # mixed admission wave


def main():
    cfg = llama.llama3_8b(quant="w4a8", kv_quant="int8", max_seq_len=4096)
    params = llama.random_quantized_params(cfg, jax.random.PRNGKey(0))

    def slope(make_loop, *args, n_lo=1, n_hi=3):
        # params as a jit ARG, not a captured constant (5 GB constants
        # wedge lowering; also measured ~5% slower as closure constants)
        loop = jax.jit(make_loop)
        np.asarray(loop(n_hi, params, *args))  # compile + warm

        def t(n):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                np.asarray(loop(n, params, *args))
                best = min(best, time.perf_counter() - t0)
            return best

        return (t(n_hi) - t(n_lo)) / (n_hi - n_lo)

    # ---- packed round at each live-entry count -------------------------
    def packed_loop(n, p, toks, cache, lens, slots, pos):
        def body(_, carry):
            toks, cache = carry
            logits, cache = llama.prefill_chunk_step_packed(
                p, cache, toks, lens, slots, pos, cfg,
            )
            bump = (logits.reshape(-1)[0] * 1e-30).astype(jnp.int32)
            return (toks + bump, cache)

        toks, cache = jax.lax.fori_loop(0, n, body, (toks, cache))
        return toks.reshape(-1)[0]

    t_packed = {}
    for e_n in (8, 4, 2, 1):
        cache = llama.init_kv_cache(cfg, BW)
        toks = jnp.zeros((e_n, C), jnp.int32)
        lens = jnp.full((e_n,), C, jnp.int32)
        slots = jnp.arange(e_n, dtype=jnp.int32)
        pos = jnp.full((e_n,), C, jnp.int32)  # mid-prefill round
        t_packed[e_n] = slope(packed_loop, toks, cache, lens, slots, pos)
        print(f"packed round e_n={e_n}: {t_packed[e_n]*1e3:.1f} ms "
              f"({e_n*C/t_packed[e_n]:.0f} tok/s)")

    # ---- padded round (every wave slot steps) --------------------------
    def padded_loop(n, p, toks, cache, pos):
        def body(_, carry):
            toks, cache = carry
            logits, cache = llama.prefill_chunk_step(
                p, cache, toks, pos, cfg,
            )
            bump = (logits.reshape(-1)[0] * 1e-30).astype(jnp.int32)
            return (toks + bump, cache)

        toks, cache = jax.lax.fori_loop(0, n, body, (toks, cache))
        return toks.reshape(-1)[0]

    cache = llama.init_kv_cache(cfg, BW)
    toks = jnp.zeros((BW, C), jnp.int32)
    t_padded = slope(padded_loop, toks, cache, jnp.int32(C))
    print(f"padded round bw={BW}: {t_padded*1e3:.1f} ms "
          f"({BW*C/t_padded:.0f} tok/s)")

    # ---- integrate both schedules over the LENS wave -------------------
    n_rounds = -(-max(LENS) // C)
    total_padded = n_rounds * t_padded
    total_packed = 0.0
    for j in range(n_rounds):
        live = sum(1 for l in LENS if l > j * C)
        e_n = 1
        while e_n < live:
            e_n *= 2
        total_packed += t_packed[min(e_n, BW)]
    toks_total = sum(LENS)
    print(f"wave lens={LENS}")
    print(f"padded wave:  {total_padded*1e3:.0f} ms "
          f"({toks_total/total_padded:.0f} tok/s prefill)")
    print(f"packed wave:  {total_packed*1e3:.0f} ms "
          f"({toks_total/total_packed:.0f} tok/s prefill)  "
          f"speedup {total_padded/total_packed:.2f}x")


if __name__ == "__main__":
    main()
