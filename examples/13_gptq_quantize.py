"""GPTQ calibration-based W4A16 quantization + perplexity delta.

The BASELINE accuracy gate in action: quantize a Llama tree with GPTQ
(models/quantize.py — layer-sequential second-order error compensation)
and compare eval NLL against round-to-nearest and the full-precision
model. With the trained checkpoint present (checkpoints/tinylm_byte.npz)
this reproduces the bench gate; otherwise it runs on random weights as a
pipeline demo.
"""
from pathlib import Path

from _common import setup

jnp, on_tpu = setup()
import math

import jax
import numpy as np

from composable_kernel_tpu.models import llama
from composable_kernel_tpu.models.eval import nll
from composable_kernel_tpu.models.quantize import gptq_quantize_llama

ckpt = Path(__file__).parent.parent / "checkpoints" / "tinylm_byte.npz"
base = dict(dim=256, n_layers=4, n_heads=8, n_kv_heads=4, ffn_dim=1024,
            vocab_size=512, max_seq_len=512, dtype="float32")
cfg_full = llama.tiny_config(**base, quant="bf16", group_size=128)
cfg_q = llama.tiny_config(**base, quant="w4a16", group_size=128)

if ckpt.exists():
    from composable_kernel_tpu.models.loader import load_quantized

    params = load_quantized(ckpt)
    toks = np.load(ckpt.parent / "tinylm_eval_tokens.npy")
    calib = np.load(ckpt.parent / "tinylm_calib_tokens.npy")
    n_eval = 64 if on_tpu else 4
else:
    print("(no trained checkpoint — random-weights demo)")
    params = llama.init_weights(cfg_full, jax.random.PRNGKey(0))
    toks = np.random.default_rng(0).integers(0, 256, 40000).astype(np.int32)
    calib = np.random.default_rng(1).integers(0, 256, (16, 256)).astype(np.int32)
    n_eval = 4

qp_gptq = gptq_quantize_llama(params, cfg_q, calib, percdamp=0.05)
qp_rtn = llama.quantize_weights(params, cfg_q)

kw = dict(seq_len=256, batch_size=8, kernels=on_tpu, max_windows=n_eval)
v_full = nll(params, cfg_full, toks, **kw)
v_rtn = nll(qp_rtn, cfg_q, toks, **kw)
v_gptq = nll(qp_gptq, cfg_q, toks, **kw)
print(f"ppl: full {math.exp(v_full):.4f}  RTN {math.exp(v_rtn):.4f}  "
      f"GPTQ {math.exp(v_gptq):.4f}")
print(f"delta vs full: RTN {math.exp(v_rtn)-math.exp(v_full):+.4f}  "
      f"GPTQ {math.exp(v_gptq)-math.exp(v_full):+.4f}")
assert v_gptq <= v_rtn + 1e-6, "GPTQ should not be worse than RTN"
print("verification: OK")
