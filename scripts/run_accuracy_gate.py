"""Full accuracy gate: W4A16 / W4A8 / W8A8 ppl deltas at the 83M
checkpoint, kernel path, on-chip.

bench.py's gate reports the BASELINE-contract W4A16 row; this runs the
complete matrix (VERDICT r2 weak #7's ask) on `tinylm_small.npz`
(12L/768d, 83.4M params, scripts/train_tiny_lm.py --size small):

  - W4A16 g128 GPTQ  (the BASELINE contract: delta <= 0.1)
  - W4A8  g128 GPTQ  (per-token int8 activations on the int8-MXU kernels)
  - W8A8  per-channel GPTQ + SmoothQuant (dynamic serving path)
  - W8A16 per-channel RTN

Usage: python scripts/run_accuracy_gate.py [--windows 128]
       [--size small|medium] [--round 5]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=128)
    ap.add_argument("--size", choices=("small", "medium"), default="small")
    ap.add_argument("--round", type=int, default=5)
    args = ap.parse_args()

    import jax

    from composable_kernel_tpu.models import llama
    from composable_kernel_tpu.models.eval import perplexity
    from composable_kernel_tpu.models.loader import load_quantized
    from composable_kernel_tpu.models.quantize import (
        gptq_quantize_llama,
        smoothquant_quantize_llama,
    )

    on_tpu = jax.default_backend() == "tpu"
    ckdir = Path(__file__).resolve().parent.parent / "checkpoints"
    stem = f"tinylm_{args.size}"
    arch = json.loads((ckdir / f"{stem}_meta.json").read_text())
    base = dict(**arch, vocab_size=512, max_seq_len=512, dtype="float32")
    params = load_quantized(ckdir / f"{stem}.npz")
    toks = np.load(ckdir / f"{stem}_eval_tokens.npy")
    calib = np.load(ckdir / f"{stem}_calib_tokens.npy")
    n_params_m = round(sum(
        np.asarray(x).size for x in jax.tree.leaves(params)) / 1e6, 1)
    kw = dict(seq_len=256, batch_size=16, kernels=on_tpu,
              max_windows=args.windows)

    out_path = (Path(__file__).resolve().parent.parent / "docs" / "perf"
                / f"accuracy_gate_r{args.round}.jsonl")

    def record(name, quant, p, delta):
        # append incrementally: the tunnel can stall for tens of minutes,
        # so completed rows must survive a killed run
        with open(out_path, "a") as f:
            f.write(json.dumps(dict(
                name=name, quant=quant, ppl=round(p, 4),
                delta=round(delta, 4), n_params_m=n_params_m,
                size=args.size,
                windows=args.windows, kernels=on_tpu)) + "\n")

    cfg_full = llama.tiny_config(**base, quant="bf16", group_size=128)
    p_full = perplexity(params, cfg_full, toks, **kw)
    print(f"full f32                 : ppl {p_full:.4f}", flush=True)
    record("full", "none", p_full, 0.0)

    def gate(name, cfg_q, params_q):
        p = perplexity(params_q, cfg_q, toks, **kw)
        delta = p - p_full
        verdict = "PASS" if delta <= 0.1 else "FAIL"
        print(f"{name:25s}: ppl {p:.4f}  delta {delta:+.4f}  [{verdict}]",
              flush=True)
        record(name, cfg_q.quant, p, delta)
        return delta

    cfg = llama.tiny_config(**base, quant="w4a16", group_size=128)
    gate("w4a16 g128 gptq", cfg,
         gptq_quantize_llama(params, cfg, calib, percdamp=0.05))

    cfg = llama.tiny_config(**base, quant="w4a8", group_size=128)
    gate("w4a8 g128 gptq", cfg,
         gptq_quantize_llama(params, cfg, calib, percdamp=0.05))

    cfg = llama.tiny_config(**base, quant="w8a8", group_size=128)
    gate("w8a8 perchannel gptq", cfg,
         gptq_quantize_llama(params, cfg, calib, percdamp=0.05))
    gate("w8a8 smoothquant", cfg,
         smoothquant_quantize_llama(params, cfg, calib))

    cfg = llama.tiny_config(**base, quant="int8", group_size=128)
    gate("w8a16 perchannel rtn", cfg, llama.quantize_weights(params, cfg))


if __name__ == "__main__":
    main()
