"""Checkpoint loader: HF safetensors -> quantized packed device arrays.

The S4 weight-loading path (SURVEY.md §5: "weight loading (safetensors ->
sharded device arrays)" is the only persistence the inference engine
needs). HF Llama checkpoints store [out_features, in_features] matrices;
our kernels consume [K, N], so every linear is transposed on load. The
quantize+pack hot path runs in the native C++ runtime
(``runtime.native``: multithreaded, bit-identical to the jnp reference).

Supports single-file and index-sharded (model.safetensors.index.json)
checkpoints.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from composable_kernel_tpu.models.llama import _QUANT_KEYS, _ROW_PARALLEL, LlamaConfig
from composable_kernel_tpu.runtime import native

#: HF parameter name -> (our key, needs_transpose)
_HF_LAYER_MAP = {
    "input_layernorm.weight": ("attn_norm", False),
    "self_attn.q_proj.weight": ("wq", True),
    "self_attn.k_proj.weight": ("wk", True),
    "self_attn.v_proj.weight": ("wv", True),
    "self_attn.o_proj.weight": ("wo", True),
    "post_attention_layernorm.weight": ("ffn_norm", False),
    "mlp.gate_proj.weight": ("w_gate", True),
    "mlp.up_proj.weight": ("w_up", True),
    "mlp.down_proj.weight": ("w_down", True),
    # Qwen2-style projection biases (absent in Llama/Mistral checkpoints;
    # required only when cfg.qkv_bias)
    "self_attn.q_proj.bias": ("bq", False),
    "self_attn.k_proj.bias": ("bk", False),
    "self_attn.v_proj.bias": ("bv", False),
}

#: HF Mixtral MoE names: block_sparse_moe.gate.weight [E, d] (router) and
#: block_sparse_moe.experts.{e}.w{1,2,3}.weight — w1=gate [f,d], w3=up
#: [f,d], w2=down [d,f]; all transpose to our [K, N]
_HF_MOE_EXPERT_MAP = {"w1": "w_gate", "w3": "w_up", "w2": "w_down"}


def _open_shards(ckpt_dir: Path):
    """Yield (name -> np.ndarray loader) handles across checkpoint shards."""
    from safetensors import safe_open

    index = ckpt_dir / "model.safetensors.index.json"
    if index.exists():
        weight_map = json.loads(index.read_text())["weight_map"]
        by_file: dict[str, list[str]] = {}
        for name, fname in weight_map.items():
            by_file.setdefault(fname, []).append(name)
        for fname in sorted(by_file):
            yield safe_open(str(ckpt_dir / fname), framework="np")
    else:
        files = sorted(ckpt_dir.glob("*.safetensors"))
        if not files:
            raise FileNotFoundError(f"no safetensors under {ckpt_dir}")
        for f in files:
            yield safe_open(str(f), framework="np")


def _to_f32(raw: np.ndarray) -> np.ndarray:
    if raw.dtype == np.float32:
        return raw
    if raw.dtype == np.uint16 or raw.dtype.str in ("<V2", "|V2"):
        return native.bf16_to_f32(raw.view(np.uint16))
    if raw.dtype == np.float16:
        return native.f16_to_f32(raw.view(np.uint16))
    if str(raw.dtype) == "bfloat16":  # ml_dtypes-backed numpy
        return native.bf16_to_f32(raw.view(np.uint16))
    return raw.astype(np.float32)


def _quantize_leaf(w_f32: np.ndarray, cfg: LlamaConfig, row_parallel: bool):
    import jax.numpy as jnp

    if cfg.quant == "bf16":
        return jnp.asarray(native.f32_to_bf16_raw(w_f32)).view(jnp.bfloat16)
    if cfg.quant == "int8":
        q, s = native.quantize_per_channel_int8(w_f32)
        return {"q": jnp.asarray(q), "s": jnp.asarray(s)}
    if cfg.quant == "w4a16":
        blocks = cfg.tp_pack if row_parallel else 1
        q, s = native.quantize_group_int4_pack(w_f32, cfg.group_size, blocks)
        return {"q": jnp.asarray(q), "s": jnp.asarray(s)}
    raise ValueError(cfg.quant)


def load_llama(ckpt_dir, cfg: LlamaConfig):
    """Load an HF-format Llama checkpoint, quantizing per ``cfg.quant``.

    Returns the params pytree consumed by ``models.llama.forward``.
    """
    import jax.numpy as jnp

    ckpt_dir = Path(ckpt_dir)
    layers = [dict() for _ in range(cfg.n_layers)]
    top: dict = {"layers": layers}
    # with cfg.fuse_qkv, q/k/v (and gate/up) must be concatenated along N
    # BEFORE quantization so the params tree matches quantize_weights();
    # stage their f32 forms here since shards may split a layer
    _FUSE = {"wq", "wk", "wv", "w_gate", "w_up"} if cfg.fuse_qkv else set()
    if cfg.fuse_qkv and cfg.qkv_bias:
        _FUSE |= {"bq", "bk", "bv"}
    staging: list[dict] = [dict() for _ in range(cfg.n_layers)]
    # MoE expert stacks assemble across shards: {key: {expert: f32 [K, N]}}
    moe_staging: list[dict] = [dict() for _ in range(cfg.n_layers)]

    def as_model_dtype(x):
        return jnp.asarray(native.f32_to_bf16_raw(_to_f32(x))).view(jnp.bfloat16)

    for shard in _open_shards(ckpt_dir):
        for name in shard.keys():
            raw = shard.get_tensor(name)
            if name == "model.embed_tokens.weight":
                top["embed"] = as_model_dtype(raw)
                continue
            if name == "model.norm.weight":
                top["norm"] = as_model_dtype(raw)
                continue
            if name == "lm_head.weight":
                w = native.transpose_f32(_to_f32(raw))
                top["lm_head"] = _quantize_leaf(w, cfg, False)
                continue
            if not name.startswith("model.layers."):
                continue
            rest = name[len("model.layers.") :]
            idx_s, sub = rest.split(".", 1)
            i = int(idx_s)
            if i >= cfg.n_layers:
                continue
            if sub == "block_sparse_moe.gate.weight":
                moe_staging[i]["router"] = native.transpose_f32(_to_f32(raw))
                continue
            if sub.startswith("block_sparse_moe.experts."):
                e_s, w_name, _ = sub[len("block_sparse_moe.experts.") :].split(".")
                key = _HF_MOE_EXPERT_MAP[w_name]
                moe_staging[i].setdefault(key, {})[int(e_s)] = (
                    native.transpose_f32(_to_f32(raw))
                )
                continue
            if sub not in _HF_LAYER_MAP:
                continue
            key, needs_t = _HF_LAYER_MAP[sub]
            if key in _FUSE:
                staging[i][key] = (
                    native.transpose_f32(_to_f32(raw)) if needs_t else _to_f32(raw)
                )
            elif key in _QUANT_KEYS:
                w = native.transpose_f32(_to_f32(raw)) if needs_t else _to_f32(raw)
                layers[i][key] = _quantize_leaf(
                    w, cfg, row_parallel=key in _ROW_PARALLEL
                )
            else:
                layers[i][key] = as_model_dtype(raw)

    if cfg.fuse_qkv:
        for i, stage in enumerate(staging):
            missing_fuse = _FUSE - set(stage)
            if missing_fuse:
                raise ValueError(
                    f"layer {i}: fuse_qkv needs {sorted(missing_fuse)}"
                )
            layers[i]["wqkv"] = _quantize_leaf(
                np.concatenate([stage["wq"], stage["wk"], stage["wv"]], axis=1),
                cfg, row_parallel=False,
            )
            if cfg.qkv_bias:
                layers[i]["bqkv"] = as_model_dtype(
                    np.concatenate([stage["bq"], stage["bk"], stage["bv"]])
                )
            layers[i]["w_gateup"] = _quantize_leaf(
                np.concatenate([stage["w_gate"], stage["w_up"]], axis=1),
                cfg, row_parallel=False,
            )

    if cfg.n_experts > 0:
        from composable_kernel_tpu.models.moe import quantize_moe_weights

        for i, st in enumerate(moe_staging):
            missing_moe = {"router", "w_gate", "w_up", "w_down"} - set(st)
            if missing_moe:
                raise ValueError(f"layer {i}: MoE needs {sorted(missing_moe)}")
            stacks = {"router": jnp.asarray(st["router"], jnp.float32)}
            for key in ("w_gate", "w_up", "w_down"):
                by_e = st[key]
                assert len(by_e) == cfg.n_experts, (i, key, sorted(by_e))
                stacks[key] = jnp.stack(
                    [jnp.asarray(by_e[e], jnp.float32)
                     for e in range(cfg.n_experts)]
                )
            if cfg.quant == "bf16":
                layers[i]["moe"] = {
                    k: v.astype(jnp.bfloat16) if k != "router" else v
                    for k, v in stacks.items()
                }
            elif cfg.quant == "w4a8":
                layers[i]["moe"] = quantize_moe_weights(
                    stacks, mode="w4a8", group_size=cfg.group_size
                )
            else:
                # int8 / w8a8 / w4a16 experts ride the per-channel-int8
                # grouped path (llama.quantize_weights.quant_moe stance)
                layers[i]["moe"] = quantize_moe_weights(stacks, mode="w8a16")

    if "lm_head" not in top and "embed" in top:
        # tied embeddings (Llama-3.2 style): lm_head = embed^T
        w = native.transpose_f32(
            np.asarray(top["embed"].astype(jnp.float32))
        )
        top["lm_head"] = _quantize_leaf(w, cfg, False)
    fused_to = {"wq": "wqkv", "wk": "wqkv", "wv": "wqkv",
                "w_gate": "w_gateup", "w_up": "w_gateup"} if cfg.fuse_qkv else {}
    if cfg.fuse_qkv:
        fused_to.update({"bq": "bqkv", "bk": "bqkv", "bv": "bqkv"})
    required = {k for k, _ in _HF_LAYER_MAP.values()}
    if not cfg.qkv_bias:
        required -= {"bq", "bk", "bv"}
    if cfg.n_experts > 0:
        required -= {"w_gate", "w_up", "w_down"}  # checked in the MoE pass
    missing = [
        (i, k)
        for i, layer in enumerate(layers)
        for k in sorted(required)
        if fused_to.get(k, k) not in layer
    ]
    if missing:
        raise ValueError(f"checkpoint missing {missing[:5]} (+{len(missing)} total)")
    return top


def save_quantized(params, path):
    """Persist a quantized params tree as an .npz (engine-native format)."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict) and "q" in node and "s" in node:
            flat[prefix + ".q"] = np.asarray(node["q"])
            flat[prefix + ".s"] = np.asarray(node["s"])
        elif isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}.{k}" if prefix else k, v)
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(f"{prefix}.{i}", v)
        else:
            arr = np.asarray(node)
            if arr.dtype.name == "bfloat16":
                flat[prefix + "#bf16"] = arr.view(np.uint16)
            else:
                flat[prefix] = arr
    walk("", params)
    np.savez(path, **flat)


def load_quantized(path):
    """Inverse of :func:`save_quantized`."""
    import jax.numpy as jnp

    data = np.load(path)
    tree: dict = {}
    for name in data.files:
        is_bf16 = name.endswith("#bf16")
        key = name[:-5] if is_bf16 else name
        parts = key.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        val = data[name]
        node[parts[-1]] = (
            jnp.asarray(val).view(jnp.bfloat16) if is_bf16 else jnp.asarray(val)
        )

    def listify(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [listify(node[str(i)]) for i in range(len(node))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(tree)
