"""Multi-device parallelism: mesh, TP sharding, shard_map wrappers.

The reference has NO distributed layer (SURVEY.md §2.6: CK is single-GPU;
its whole execution context is one hipStream). This module is the
TPU-native addition the north star requires: a ``jax.sharding.Mesh`` over
ICI/DCN, Megatron-style tensor parallelism for the Llama stack, and data
parallelism — all via ``shard_map`` so the Pallas kernels run per-shard
with XLA collectives (psum over ICI) stitching the results.

Sharding plan (the "How to Scale Your Model" TP recipe):

  - wq/wk/wv, w_gate/w_up : column-parallel (output dim sharded on 'tp')
  - wo, w_down            : row-parallel (input dim sharded; psum after)
  - embed / norms / lm_head: replicated
  - activations           : batch on 'dp', replicated on 'tp'
  - KV cache              : heads on 'tp', batch on 'dp'

Quantized leaves ({"q": ..., "s": ...}) shard with their weight: packed
int4 along K shards the packed rows AND the group-scale rows for the
row-parallel case, and shards N for scales in the column-parallel case.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from composable_kernel_tpu.models import llama


def make_mesh(tp: int = 1, dp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. tp should map to the ICI-adjacent axis."""
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= tp * dp, (len(devices), tp, dp)
    import numpy as np

    arr = np.array(devices[: tp * dp]).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


# --------------------------------------------------------- sharding specs ---


def param_specs(params, cfg: llama.LlamaConfig):
    """PartitionSpec pytree matching ``params`` for the TP plan above."""

    def w_spec(w, col: bool):
        if isinstance(w, dict):  # quantized {"q","s"}
            if col:
                s_spec = P("tp") if w["s"].ndim == 1 else P(None, "tp")
                return {"q": P(None, "tp"), "s": s_spec}
            # row-parallel: packed K rows shard on tp; group scales [G, N]
            # shard G (per-channel [N] scales replicate)
            s_spec = P() if w["s"].ndim == 1 else P("tp", None)
            return {"q": P("tp", None), "s": s_spec}
        return P(None, "tp") if col else P("tp", None)

    def moe_spec(w):
        # Expert parallelism over the same mesh axis: stacks [E, ...]
        # shard experts on 'tp' (router replicated; non-array leaves like
        # the "gs" group-size marker get P() and are skipped at placement)
        def stack(v):
            if isinstance(v, dict):
                return {k: P("tp") if hasattr(v[k], "ndim") else P()
                        for k in v}
            return P("tp")

        return {
            "router": P(),
            "w_gate": stack(w["w_gate"]),
            "w_up": stack(w["w_up"]),
            "w_down": stack(w["w_down"]),
        }

    def layer_spec(layer):
        spec = {"attn_norm": P(), "ffn_norm": P()}
        if "wqkv" in layer:
            # fused trees shard column-parallel AFTER the shard-local
            # column permutation of permute_fused_for_tp (each tp slice
            # must hold its own contiguous q|k|v segment) — shard_params
            # applies it; see that docstring
            spec["wqkv"] = w_spec(layer["wqkv"], True)
            if "bqkv" in layer:
                spec["bqkv"] = P("tp")
        else:
            spec.update(
                wq=w_spec(layer["wq"], True),
                wk=w_spec(layer["wk"], True),
                wv=w_spec(layer["wv"], True),
            )
            for b in ("bq", "bk", "bv"):
                if b in layer:  # Qwen2-style biases: column-parallel
                    spec[b] = P("tp")
        spec["wo"] = w_spec(layer["wo"], False)
        if "moe" in layer:
            spec["moe"] = moe_spec(layer["moe"])
        elif "w_gateup" in layer:
            spec["w_gateup"] = w_spec(layer["w_gateup"], True)
            spec["w_down"] = w_spec(layer["w_down"], False)
        else:
            spec.update(
                w_gate=w_spec(layer["w_gate"], True),
                w_up=w_spec(layer["w_up"], True),
                w_down=w_spec(layer["w_down"], False),
            )
        return spec
    return {
        "embed": P(),
        "layers": [layer_spec(l) for l in params["layers"]],
        "norm": P(),
        "lm_head": (
            {"q": P(), "s": P()} if isinstance(params["lm_head"], dict) else P()
        ),
    }


def permute_fused_for_tp(params, cfg: llama.LlamaConfig, tp: int):
    """Reorder fused-projection columns to shard-local segment order.

    A fused wqkv is laid out [q(all heads) | k | v]; a plain P(None, 'tp')
    split would hand shard 0 only q columns. Permuting to
    ``concat_s [q_s | k_s | v_s]`` makes every tp slice a self-contained
    smaller fused projection, so one column PartitionSpec shards it and
    ``_qkv_proj``'s proportional split stays correct per shard (same idea
    as the segmented int4 pack for row-parallel K, indexing.py). Applies
    to wqkv (+bqkv) and w_gateup; packed "q" leaves permute columns
    identically (the split-halves pack is row-wise).
    """
    nh, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    assert nh % tp == 0 and nkv % tp == 0, (nh, nkv, tp)
    import numpy as np

    def perm_cols(n_total, segs):
        """segs = [(start, width_per_shard), ...] in the fused layout."""
        idx = []
        for s in range(tp):
            for start, w in segs:
                idx.extend(range(start + s * w, start + (s + 1) * w))
        assert len(idx) == n_total
        return np.asarray(idx, np.int64)

    def apply(w, idx):
        if isinstance(w, dict):
            out = {k: (v[..., idx] if hasattr(v, "ndim") and v.ndim >= 1
                       else v) for k, v in w.items()}
            return out
        return w[..., idx]

    qkv_idx = None
    gu_idx = None
    out = dict(params)
    layers = []
    for layer in params["layers"]:
        layer = dict(layer)
        if "wqkv" in layer:
            if qkv_idx is None:
                n_q, n_kv = nh * hd, nkv * hd
                qkv_idx = perm_cols(
                    n_q + 2 * n_kv,
                    [(0, n_q // tp), (n_q, n_kv // tp),
                     (n_q + n_kv, n_kv // tp)],
                )
            layer["wqkv"] = apply(layer["wqkv"], qkv_idx)
            if "bqkv" in layer:
                layer["bqkv"] = layer["bqkv"][qkv_idx]
        if "w_gateup" in layer:
            if gu_idx is None:
                f = cfg.ffn_dim
                gu_idx = perm_cols(2 * f, [(0, f // tp), (f, f // tp)])
            layer["w_gateup"] = apply(layer["w_gateup"], gu_idx)
        layers.append(layer)
    out["layers"] = layers
    return out


def shard_params(params, cfg: llama.LlamaConfig, mesh: Mesh):
    """Place ``params`` on ``mesh`` with the TP plan (jax.device_put).

    Fused wqkv/w_gateup trees are column-permuted to shard-local segment
    order first (permute_fused_for_tp), so the returned tree is only
    meaningful under the mesh sharding — don't feed it back to an
    unsharded forward."""
    tp = mesh.shape["tp"]
    if tp > 1 and any(
        "wqkv" in l or "w_gateup" in l for l in params["layers"]
    ):
        params = permute_fused_for_tp(params, cfg, tp)
    if cfg.n_experts > 0:
        tp = mesh.shape["tp"]
        assert cfg.n_experts % tp == 0, (
            f"expert stacks shard over 'tp' as EP: n_experts="
            f"{cfg.n_experts} must divide by tp={tp}"
        )
    specs = param_specs(params, cfg)
    return jax.tree.map(
        lambda x, s: (
            jax.device_put(x, NamedSharding(mesh, s))
            if hasattr(x, "shape") else x
        ),
        params,
        specs,
        is_leaf=lambda x: isinstance(x, jnp.ndarray) or hasattr(x, "shape"),
    )


# ----------------------------------------------------- shard_map wrappers ---


def _strip_gs(tree):
    """Split static ``gs`` group-size markers out of quant dicts.

    shard_map canonicalizes every P()-specced leaf to a device array, so a
    Python-int ``gs`` crossing the boundary becomes a tracer and the w4a8
    kernels' ``k % group_size`` shape math raises
    TracerBoolConversionError. Returns (stripped tree, {path: gs}) —
    re-attach inside the shard_map body with :func:`_restore_gs`.
    """
    found = {}

    def walk(x, path):
        if isinstance(x, dict):
            out = {}
            for k, v in x.items():
                if k == "gs" and not hasattr(v, "shape"):
                    found[path] = v
                else:
                    out[k] = walk(v, path + (k,))
            return out
        if isinstance(x, list):
            return [walk(v, path + (i,)) for i, v in enumerate(x)]
        return x

    return walk(tree, ()), found


def _restore_gs(tree, found):
    for path, gs in found.items():
        node = tree
        for p in path:
            node = node[p]
        node["gs"] = gs
    return tree


def tp_forward(params, tokens, cfg: llama.LlamaConfig, mesh: Mesh, *, kernels=True):
    """TP+DP prefill: logits [B, S, V]. Run under jit for real use."""
    params, gs_map = _strip_gs(params)
    specs = param_specs(params, cfg)

    fwd = partial(llama.forward, cfg=cfg, tp_axis="tp", kernels=kernels)

    def inner(params, tokens):
        return fwd(_restore_gs(params, gs_map), tokens)

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, P("dp", None)),
        out_specs=P("dp", None, None),
        check_rep=False,
    )(params, tokens)


def tp_decode_step(params, cache, tokens, pos, cfg: llama.LlamaConfig, mesh: Mesh,
                   *, kernels=True):
    """TP+DP one-token decode over a head-sharded KV cache."""
    params, gs_map = _strip_gs(params)
    specs = param_specs(params, cfg)
    kv_spec = P("dp", "tp", None, None)
    entry_spec = {"k": kv_spec, "v": kv_spec}
    if cfg.kv_quant == "int8":
        entry_spec = {**entry_spec, "ks": P("dp", "tp"), "vs": P("dp", "tp")}
    cache_spec = [entry_spec for _ in range(cfg.n_layers)]

    def inner(params, cache, tokens, pos):
        return llama.decode_step(
            _restore_gs(params, gs_map), cache, tokens, pos[0], cfg,
            tp_axis="tp", kernels=kernels,
        )

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, cache_spec, P("dp", None), P()),
        out_specs=(P("dp", None, None), cache_spec),
        check_rep=False,
    )(params, cache, tokens, jnp.asarray([pos], jnp.int32))


def tp_decode_step_batched(params, cache, tokens, positions,
                           cfg: llama.LlamaConfig, mesh: Mesh, *,
                           kernels=True):
    """TP+DP continuous-batching decode: per-slot positions over a
    head-sharded KV cache.

    The batched analog of :func:`tp_decode_step` — routes through
    ``llama.decode_step_batched``, so the deferred-append fast path
    (rope+quant+pack prep kernel, in-VMEM fresh-token fold-in,
    end-of-step slab rewrites) runs per shard on its local head group
    with the same wo/down psums the prefill TP plan uses.

    tokens: [B, 1]; positions: [B] int32 (B sharded over 'dp').
    """
    params, gs_map = _strip_gs(params)
    specs = param_specs(params, cfg)
    kv_spec = P("dp", "tp", None, None)
    entry_spec = {"k": kv_spec, "v": kv_spec}
    if cfg.kv_quant == "int8":
        entry_spec = {**entry_spec, "ks": P("dp", "tp"), "vs": P("dp", "tp")}
    cache_spec = [entry_spec for _ in range(cfg.n_layers)]

    def inner(params, cache, tokens, positions):
        return llama.decode_step_batched(
            _restore_gs(params, gs_map), cache, tokens, positions, cfg,
            tp_axis="tp", kernels=kernels,
        )

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, cache_spec, P("dp", None), P("dp")),
        out_specs=(P("dp", None, None), cache_spec),
        check_rep=False,
    )(params, cache, tokens, jnp.asarray(positions, jnp.int32))


# ------------------------------------------------------------ train step ---


def train_step(params, opt_state, tokens, cfg: llama.LlamaConfig, mesh: Mesh,
               lr: float = 1e-4):
    """One DP+TP causal-LM training step (SGD) over the mesh.

    Uses the differentiable jnp path (``kernels=False``); the flash/quant
    kernels are inference-side until their custom VJPs land. Gradients are
    psum'd over 'dp' inside shard_map; TP weights get per-shard gradients
    (no cross-tp reduction needed for column/row splits — activations are
    replicated on 'tp', and the psum in forward handles the row-parallel
    sum). Returns (params, opt_state, loss).
    """
    assert cfg.quant == "bf16", "training runs on unquantized weights"
    specs = param_specs(params, cfg)

    def loss_fn(p, toks):
        logits = llama.forward(p, toks[:, :-1], cfg, tp_axis="tp", kernels=False)
        targets = toks[:, 1:]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        ll = jnp.take_along_axis(logp, targets[..., None], axis=-1)
        return -jnp.mean(ll)

    def inner(p, opt, toks):
        loss, grads = jax.value_and_grad(loss_fn)(p, toks)
        loss = jax.lax.pmean(loss, "dp")
        grads = jax.tree.map(lambda g: jax.lax.pmean(g, "dp"), grads)
        new_p = jax.tree.map(lambda w, g: w - lr * g.astype(w.dtype), p, grads)
        new_opt = jax.tree.map(lambda o, g: o + jnp.square(g), opt, grads)
        return new_p, new_opt, loss

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(specs, specs, P("dp", None)),
        out_specs=(specs, specs, P()),
        check_rep=False,
    )(params, opt_state, tokens)


def init_opt_state(params):
    """Toy accumulator state (grad-norm tracker) matching the params tree."""
    return jax.tree.map(lambda w: jnp.zeros_like(w, jnp.float32), params)
