"""Serving feature tour: paged KV engine, per-request sampling,
speculative decoding.

The reference is a kernel library with no serving stack; these are the
TPU-native serving layers the north star requires, composed: a paged-pool
continuous-batching engine running mixed greedy/sampled requests, then a
draft-verify speculative loop whose output exactly equals greedy decoding.
"""
from _common import setup

jnp, on_tpu = setup()
import numpy as np

import jax

from composable_kernel_tpu.models import llama
from composable_kernel_tpu.runtime.serving import Request, ServingEngine
from composable_kernel_tpu.runtime.speculative import generate_speculative

cfg = llama.tiny_config(quant="bf16", n_layers=2, dtype="float32",
                        max_seq_len=256)
params = llama.init_weights(cfg, jax.random.PRNGKey(0))

# --- paged continuous batching with mixed sampling modes ----------------
eng = ServingEngine(params, cfg, batch_slots=3, kernels=on_tpu,
                    paged=True, page_size=128, seed=42)
reqs = [
    Request(0, [5, 9, 2, 14], max_new_tokens=8),                 # greedy
    Request(1, [7, 7, 7], max_new_tokens=8, temperature=0.8,
            top_k=50),                                           # sampled
    Request(2, [1, 2, 3], max_new_tokens=8, temperature=0.9,
            top_p=0.9),                                          # nucleus
]
for r in reqs:
    eng.add(r)
steps = 0
while eng.pending():
    eng.step()
    steps += 1
print(f"paged engine: {len(reqs)} requests in {steps} decode steps")
for r in reqs:
    print(f"  req {r.uid} ({'greedy' if r.temperature == 0 else 'sampled'}): "
          f"{r.output}")

# greedy request must match isolated greedy decoding exactly
want = llama.generate_greedy(
    params, jnp.asarray([reqs[0].prompt], jnp.int32), 8, cfg
)
assert reqs[0].output == list(np.asarray(want[0, len(reqs[0].prompt):]))

# --- speculative decoding ----------------------------------------------
prompt = jnp.asarray([[5, 9, 2, 14]], jnp.int32)
toks, stats = generate_speculative(params, cfg, params, cfg, prompt, 12,
                                   chunk=4, kernels=on_tpu)
plain = llama.generate_greedy(params, prompt, 12, cfg)
assert list(np.asarray(toks[0])) == list(np.asarray(plain[0]))
print(f"speculative: 12 tokens in {stats['rounds']} target steps "
      f"({stats['accepted']}/{stats['draft_steps']} drafts accepted) — "
      "output identical to plain greedy")
print("verification: OK")
