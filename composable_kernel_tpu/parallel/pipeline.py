"""Pipeline parallelism: GPipe-style microbatching over ppermute.

The 'pp' axis (absent in the single-GPU reference): the layer stack is
divided into contiguous stages, one per device along the 'pp' mesh axis;
microbatches flow through the ring with ``jax.lax.ppermute`` carrying
activations stage-to-stage. (P + M - 1) ticks drain M microbatches; every
device executes identical (uniform) control flow, with stage/validity
predicates selecting real work — the XLA-friendly formulation of a
pipeline schedule.

Embedding, final norm and the LM head are computed replicated (they are
tiny next to the layer stack); the transformer blocks pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from composable_kernel_tpu.models import llama

__all__ = ["make_pp_mesh", "stack_stage_params", "pp_forward"]


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices[:n_stages]), ("pp",))


def stack_stage_params(params, n_stages: int):
    """layers list -> tree of arrays with leading [n_stages, L/stage] dims.

    Layer dicts must be structurally identical (true for the Llama stack).
    Returns (stacked_layers_tree, shared) where shared = embed/norm/head.
    """
    layers = params["layers"]
    assert len(layers) % n_stages == 0, (len(layers), n_stages)
    per = len(layers) // n_stages
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    # [L, ...] -> [n_stages, per, ...]
    stacked = jax.tree.map(
        lambda x: x.reshape(n_stages, per, *x.shape[1:]), stacked
    )
    shared = {k: v for k, v in params.items() if k != "layers"}
    return stacked, shared


def _block(x, layer, cfg, kernels):
    cos, sin = llama.rope_cos_sin(
        jnp.arange(x.shape[1]), cfg.head_dim, cfg.rope_theta
    )
    h = llama.rmsnorm(x, layer["attn_norm"], cfg.norm_eps)
    attn, _ = llama._attn_block(h, layer, cfg, cos, sin, kernels=kernels)
    x = x + attn
    h = llama.rmsnorm(x, layer["ffn_norm"], cfg.norm_eps)
    return x + llama._ffn_block(h, layer, cfg, kernels=kernels)


def pp_forward(
    params,
    tokens,
    cfg,
    mesh: Mesh,
    *,
    n_microbatches: int = 2,
    kernels: bool = False,
):
    """Pipelined prefill: logits [B, S, V] with layers sharded over 'pp'.

    tokens: [B, S] with B divisible by ``n_microbatches``.
    """
    n_stages = mesh.shape["pp"]
    stacked, shared = stack_stage_params(params, n_stages)
    b, s = tokens.shape
    assert b % n_microbatches == 0
    mb = b // n_microbatches

    x = jnp.take(shared["embed"], tokens, axis=0)  # replicated embed
    x_mb = x.reshape(n_microbatches, mb, s, -1)

    def inner(stage_layers, x_mb):
        # stage_layers tree has leading [1, per, ...] — drop the shard dim
        stage_layers = jax.tree.map(lambda v: v[0], stage_layers)
        stage = jax.lax.axis_index("pp")
        n = n_stages

        def apply_stage(h):
            def body(carry, layer):
                return _block(carry, layer, cfg, kernels), None

            h, _ = jax.lax.scan(body, h, stage_layers)
            return h

        buf = jnp.zeros_like(x_mb[0])
        outputs = jnp.zeros_like(x_mb)
        shift = [(i, i + 1) for i in range(n - 1)]
        for t in range(n_microbatches + n - 1):
            feed_idx = jnp.clip(t, 0, n_microbatches - 1)
            feed = x_mb[feed_idx]
            h_in = jnp.where((stage == 0) & (t < n_microbatches), feed, buf)
            h = apply_stage(h_in)
            out_idx = t - (n - 1)
            write = (stage == n - 1) & (out_idx >= 0)
            upd = jax.lax.dynamic_update_slice(
                outputs, h[None], (jnp.maximum(out_idx, 0), 0, 0, 0)
            )
            outputs = jnp.where(write, upd, outputs)
            if t != n_microbatches + n - 2:
                buf = jax.lax.ppermute(h, "pp", shift)
        # only the last stage holds real outputs; psum broadcasts them
        return jax.lax.psum(outputs, "pp")

    stacked_sharded = jax.tree.map(
        lambda v: jax.device_put(
            v, NamedSharding(mesh, P("pp", *([None] * (v.ndim - 1))))
        ),
        stacked,
    )
    layer_specs = jax.tree.map(
        lambda v: P("pp", *([None] * (v.ndim - 1))), stacked
    )
    out = shard_map(
        inner,
        mesh=mesh,
        in_specs=(layer_specs, P()),
        out_specs=P(),
        check_rep=False,
    )(stacked_sharded, x_mb)

    x = out.reshape(b, s, -1)
    x = llama.rmsnorm(x, shared["norm"], cfg.norm_eps)
    logits = llama._linear(
        x.reshape(b * s, -1), shared["lm_head"], cfg, None, kernels
    )
    return logits.reshape(b, s, -1)
