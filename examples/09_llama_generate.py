"""Llama-class W4A16 generation through the serving engine."""
from _common import setup

jnp, on_tpu = setup()
import jax

from composable_kernel_tpu.models import llama
from composable_kernel_tpu.runtime.serving import Request, ServingEngine

cfg = llama.tiny_config(quant="w4a16")
params = llama.quantize_weights(llama.init_weights(cfg, jax.random.PRNGKey(0)), cfg)
eng = ServingEngine(params, cfg, batch_slots=4, kernels=True)

for uid in range(3):
    eng.add(Request(uid, [1 + uid, 7, 42], max_new_tokens=8))
while eng.pending():
    for req in eng.step():
        print(f"request {req.uid}: prompt {req.prompt} -> {req.output}")
print("generation: OK")
