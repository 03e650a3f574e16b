"""Packed-varlen (group-mode) prefill attention + load-time weight prep.

CK's fmha group mode (fmha_fwd_kernel.hpp:505-555) packs ragged batches
contiguously via seqstart arrays; here the TPU analog: sequences pack
with block-aligned starts (`pack_varlen`), the kernel walks each block's
own sequence geometry from a scalar-prefetch table, and mixed-length
batches pay sum(ceil(len/block)) compute instead of B*max. Measured
1.51x the padded flash path at mixed 128..2048 lens (v5e, GQA 32/8).

Also demos the serving-side weight prep: `llama.prepare_params` pads +
scale-expands quantized leaves whose decode N-block cannot divide N
(the vocab-sized lm_head) ONCE at load instead of every decode step.
"""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax
import numpy as np

from composable_kernel_tpu.ops.attention import (
    flash_attention,
    flash_attention_varlen,
    pack_varlen,
    unpack_varlen,
)
from composable_kernel_tpu.reference.attention import ref_attention
from composable_kernel_tpu.utils.check_err import check_err

hq, hkv, d = (32, 8, 128) if on_tpu else (4, 2, 64)
lens = [128, 384, 2048, 640, 256, 1024, 192, 512] if on_tpu else [37, 200, 260]
rngs = jax.random.split(jax.random.PRNGKey(0), 3 * len(lens))
qs = [jax.random.normal(rngs[3 * i], (L, hq, d), jnp.float32).astype(jnp.bfloat16)
      for i, L in enumerate(lens)]
ks = [jax.random.normal(rngs[3 * i + 1], (L, hkv, d), jnp.float32).astype(jnp.bfloat16)
      for i, L in enumerate(lens)]
vs = [jax.random.normal(rngs[3 * i + 2], (L, hkv, d), jnp.float32).astype(jnp.bfloat16)
      for i, L in enumerate(lens)]

bq, bk = (512, 1024) if on_tpu else (128, 128)
qp, q_starts, q_lens = pack_varlen(qs, bq)
kp, kv_starts, kv_lens = pack_varlen(ks, bk)
vp, _, _ = pack_varlen(vs, bk)
print(f"packed q rows: {qp.shape[0]} (padded-batch would be "
      f"{len(lens)} x {max(lens)} = {len(lens) * max(lens)})")

out = flash_attention_varlen(qp, kp, vp, q_starts, q_lens, kv_starts,
                             kv_lens, causal=True, block_q=bq, block_k=bk)
outs = unpack_varlen(out, q_starts, q_lens)
for i, L in enumerate(lens[:3]):
    want = ref_attention(
        qs[i].transpose(1, 0, 2)[None], ks[i].transpose(1, 0, 2)[None],
        vs[i].transpose(1, 0, 2)[None], causal=True,
    )[0].transpose(1, 0, 2)
    check_err(outs[i], want, rtol=2e-2, atol=2e-2)
print("verified vs per-sequence reference")

causal_flops = sum(2.0 * hq * L * L * (d + d) / 2.0 for L in lens)
time_and_report(
    "varlen packed prefill",
    lambda qp_: flash_attention_varlen(qp_, kp, vp, q_starts, q_lens,
                                       kv_starts, kv_lens, causal=True,
                                       block_q=bq, block_k=bk),
    qp, flops=causal_flops, on_tpu=on_tpu,
)
smax = max(lens)
qpad = jnp.stack([jnp.pad(q.transpose(1, 0, 2),
                          ((0, 0), (0, smax - q.shape[0]), (0, 0)))
                  for q in qs])
kpad = jnp.stack([jnp.pad(k.transpose(1, 0, 2),
                          ((0, 0), (0, smax - k.shape[0]), (0, 0)))
                  for k in ks])
vpad = jnp.stack([jnp.pad(v.transpose(1, 0, 2),
                          ((0, 0), (0, smax - v.shape[0]), (0, 0)))
                  for v in vs])
lens_j = jnp.asarray(lens, jnp.int32)
time_and_report(
    "padded-batch prefill (same work)",
    lambda qpad_: flash_attention(qpad_, kpad, vpad, causal=True,
                                  kv_seq_len=lens_j),
    qpad, flops=causal_flops, on_tpu=on_tpu,
)

# ---- load-time weight prep for decode serving --------------------------
from composable_kernel_tpu.models import llama
from composable_kernel_tpu.ops.quant.prepared import PreparedWeights

cfg = llama.tiny_config(quant="w4a16", vocab_size=320)
qparams = llama.quantize_weights(llama.init_weights(cfg, jax.random.PRNGKey(1)), cfg)
prepared = llama.prepare_params(qparams, cfg)
assert isinstance(prepared["lm_head"], PreparedWeights)
cache = llama.init_kv_cache(cfg, 2)
toks = jnp.zeros((2, 1), jnp.int32)
pos = jnp.zeros((2,), jnp.int32)
a, _ = llama.decode_step_batched(qparams, cache, toks, pos, cfg)
b, _ = llama.decode_step_batched(prepared, cache, toks, pos, cfg)
np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("prepare_params: lm_head pads once at load; decode bit-identical")

# ---- engine-level packed prefill ----------------------------------------
# A multi-request admission wave runs ONE forward_varlen over the packed
# prompts (runtime/serving.py _prefill_packed) instead of one per-length-
# compiled forward each.
from composable_kernel_tpu.runtime.serving import Request, ServingEngine

scfg = llama.tiny_config(quant="bf16", dtype="float32")
sparams = llama.init_weights(scfg, jax.random.PRNGKey(2))
outs = {}
for packed in (True, False):
    eng = ServingEngine(sparams, scfg, batch_slots=4, kernels=True,
                        packed_prefill=packed, pack_block=128)
    reqs = [Request(0, [5, 9, 2, 14], max_new_tokens=5),
            Request(1, list(range(1, 40)), max_new_tokens=4),
            Request(2, [7, 5], max_new_tokens=6)]
    for r in reqs:
        eng.add(r)
    while eng.pending():
        eng.step()
    outs[packed] = [r.output for r in reqs]
assert outs[True] == outs[False]
print("engine packed-prefill wave matches per-request prefill:",
      [len(o) for o in outs[True]], "tokens")
