"""Tensor+data-parallel sharded prefill on a device mesh.

The capability the reference never had (single-GPU): Megatron-style TP via
shard_map with psum over ICI. Runs on a virtual 8-device CPU mesh when no
multi-chip TPU is attached.
"""
import os

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()

from _common import setup

jnp, on_tpu = setup()
import sys

import jax

if len(jax.devices()) < 8 and os.environ.get("CKT_TP_REEXEC") != "1":
    # a single attached chip cannot host the 4x2 mesh; re-exec onto the
    # 8-virtual-device CPU backend (jax_platforms cannot change after the
    # backend initialized — updating the config here is silently inert)
    os.environ["CKT_TP_REEXEC"] = "1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["CKT_EXAMPLES_CPU"] = "1"
    os.execv(sys.executable, [sys.executable] + sys.argv)

from composable_kernel_tpu.models import llama
from composable_kernel_tpu.parallel import make_mesh, shard_params, tp_forward

cfg = llama.tiny_config(quant="w4a16", tp_pack=4)
params = llama.quantize_weights(llama.init_weights(cfg, jax.random.PRNGKey(0)), cfg)
mesh = make_mesh(tp=4, dp=2)
sharded = shard_params(params, cfg, mesh)
tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 0, cfg.vocab_size)

logits = tp_forward(sharded, tokens, cfg, mesh, kernels=False)
print(f"mesh {dict(mesh.shape)} -> logits {logits.shape} on "
      f"{len(set(d.device for d in logits.addressable_shards))} devices")
print("tensor-parallel prefill: OK")
