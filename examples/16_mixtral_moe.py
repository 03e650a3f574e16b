"""Mixtral-class MoE decoding: top-k routed experts on the ragged grouped
GEMM (CK's grouped-GEMM-fixed-NK role, device_grouped_gemm_fixed_nk.hpp:56),
composed into the Llama stack end-to-end with quantized expert stacks."""
from _common import setup, time_and_report

jnp, on_tpu = setup()
import jax

from composable_kernel_tpu.models import llama

if on_tpu:
    cfg = llama.tiny_config(
        dim=1024, n_layers=4, n_heads=16, n_kv_heads=4, ffn_dim=2048,
        vocab_size=8192, max_seq_len=512, quant="int8",
        n_experts=8, top_k_experts=2,
    )
else:
    cfg = llama.tiny_config(quant="int8", n_experts=4, top_k_experts=2)

import dataclasses

params = llama.quantize_weights(
    llama.init_weights(dataclasses.replace(cfg, quant="bf16"),
                       jax.random.PRNGKey(0)),
    cfg,
)
prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.vocab_size)

# prefill through the MoE layers, then one timed decode step
logits, seeds = llama.forward(params, prompt, cfg, return_cache=True)
cache = llama.seed_kv_cache(llama.init_kv_cache(cfg, 2), seeds, cfg)
nxt = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
pos = jnp.asarray([16, 16], jnp.int32)

step = jax.jit(
    lambda p, c, t, q: llama.decode_step_batched(p, c, t, q, cfg)
)
# per-step FLOPs: attention projections + top-k expert FFN
d, f, v = cfg.dim, cfg.ffn_dim, cfg.vocab_size
hd, nh, nkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
per_tok = 2 * d * (nh + 2 * nkv) * hd + 2 * nh * hd * d + \
    cfg.top_k_experts * 3 * 2 * d * f + 2 * d * v
flops = 2 * cfg.n_layers * per_tok  # B=2

out = time_and_report(
    "mixtral_moe_decode_step",
    lambda t, p, c, q: step(p, c, t, q)[0], nxt, params, cache, pos,
    flops=float(flops), on_tpu=on_tpu,
)
assert out.shape == (2, 1, cfg.vocab_size)
assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
print("verification: OK")
