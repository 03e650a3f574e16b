"""Native runtime + checkpoint loader tests.

The native C++ path must be bit-identical to the jnp reference quantizers
(the CK check_err integer-exact contract), and a loaded HF checkpoint must
reproduce quantize_weights(init_weights) exactly.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.models import llama
from composable_kernel_tpu.models.loader import (
    load_llama,
    load_quantized,
    save_quantized,
)
from composable_kernel_tpu.reference.quant import (
    ref_quantize_group,
    ref_quantize_per_channel,
)
from composable_kernel_tpu.runtime import native


class TestNative:
    def test_available(self):
        assert native.available(), "native lib should build in this image"

    def test_quantize_group_int4_pack_bitexact(self):
        w = np.random.randn(512, 128).astype(np.float32)
        for blocks in (1, 4):
            p_n, s_n = native.quantize_group_int4_pack(w, 64, blocks=blocks)
            w_q, s_r = ref_quantize_group(jnp.asarray(w), 64, bits=4)
            p_r = np.asarray(dtypes.pack_int4(w_q, axis=0, blocks=blocks))
            np.testing.assert_array_equal(p_n, p_r)
            np.testing.assert_allclose(s_n, np.asarray(s_r), rtol=1e-6)

    def test_quantize_per_channel_int8_bitexact(self):
        w = np.random.randn(256, 64).astype(np.float32)
        q_n, s_n = native.quantize_per_channel_int8(w)
        q_r, s_r = ref_quantize_per_channel(jnp.asarray(w), bits=8)
        np.testing.assert_array_equal(q_n, np.asarray(q_r))
        np.testing.assert_allclose(s_n, np.asarray(s_r), rtol=1e-6)

    def test_dtype_conversions_bitexact(self):
        x = np.random.randn(4096).astype(np.float32)
        bf = native.f32_to_bf16_raw(x)
        ref = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)).view(np.uint16)
        np.testing.assert_array_equal(bf, ref)
        np.testing.assert_array_equal(
            native.bf16_to_f32(bf),
            np.asarray(jnp.asarray(x).astype(jnp.bfloat16)).astype(np.float32),
        )
        h = np.asarray(jnp.asarray(x).astype(jnp.float16)).view(np.uint16)
        np.testing.assert_array_equal(
            native.f16_to_f32(h), h.view(np.float16).astype(np.float32)
        )

    def test_transpose(self):
        w = np.random.randn(130, 70).astype(np.float32)
        np.testing.assert_array_equal(native.transpose_f32(w), w.T)


def _write_hf_checkpoint(tmp_path, params, cfg):
    """Emit params as an HF-format sharded safetensors checkpoint."""
    from safetensors.numpy import save_file

    inv = {v[0]: (k, v[1]) for k, v in
           __import__("composable_kernel_tpu.models.loader",
                      fromlist=["_HF_LAYER_MAP"])._HF_LAYER_MAP.items()}
    tensors = {}

    def raw(x):
        a = np.asarray(x.astype(jnp.float32), np.float32)
        return a

    tensors["model.embed_tokens.weight"] = raw(params["embed"])
    tensors["model.norm.weight"] = raw(params["norm"])
    tensors["lm_head.weight"] = raw(params["lm_head"]).T.copy()
    for i, layer in enumerate(params["layers"]):
        for key, w in layer.items():
            if key == "moe":
                p = f"model.layers.{i}.block_sparse_moe"
                tensors[f"{p}.gate.weight"] = raw(w["router"]).T.copy()
                for e in range(w["w_gate"].shape[0]):
                    tensors[f"{p}.experts.{e}.w1.weight"] = raw(w["w_gate"][e]).T.copy()
                    tensors[f"{p}.experts.{e}.w3.weight"] = raw(w["w_up"][e]).T.copy()
                    tensors[f"{p}.experts.{e}.w2.weight"] = raw(w["w_down"][e]).T.copy()
                continue
            hf_name, needs_t = inv[key]
            a = raw(w)
            if needs_t:
                a = a.T.copy()
            tensors[f"model.layers.{i}.{hf_name}"] = a
    # two shards + index, to exercise the sharded path
    names = sorted(tensors)
    half = len(names) // 2
    shards = {"model-00001.safetensors": names[:half],
              "model-00002.safetensors": names[half:]}
    weight_map = {}
    for fname, keys in shards.items():
        save_file({k: tensors[k] for k in keys}, str(tmp_path / fname))
        weight_map.update({k: fname for k in keys})
    (tmp_path / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": weight_map})
    )


class TestLoader:
    def test_load_llama_matches_quantize_weights(self, tmp_path):
        cfg = llama.tiny_config(quant="w4a16", tp_pack=2)
        params = llama.init_weights(cfg, jax.random.PRNGKey(0))
        # bf16 -> f32 -> (HF layout) -> load+quantize must equal direct
        # quantization of the f32-identical weights
        _write_hf_checkpoint(tmp_path, params, cfg)
        loaded = load_llama(tmp_path, cfg)
        want = llama.quantize_weights(params, cfg)
        for i in range(cfg.n_layers):
            for k in ("wq", "wo", "w_down"):
                np.testing.assert_array_equal(
                    np.asarray(loaded["layers"][i][k]["q"]),
                    np.asarray(want["layers"][i][k]["q"]),
                    err_msg=f"layer {i} {k}",
                )
        # end-to-end: same logits
        toks = jax.random.randint(jax.random.PRNGKey(1), (1, 16), 0, cfg.vocab_size)
        got = llama.forward(loaded, toks, cfg, kernels=False)
        ref = llama.forward(want, toks, cfg, kernels=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_save_load_quantized_roundtrip(self, tmp_path):
        cfg = llama.tiny_config(quant="w4a16")
        params = llama.quantize_weights(
            llama.init_weights(cfg, jax.random.PRNGKey(0)), cfg
        )
        p = tmp_path / "model.npz"
        save_quantized(params, p)
        loaded = load_quantized(p)
        np.testing.assert_array_equal(
            np.asarray(loaded["layers"][0]["wq"]["q"]),
            np.asarray(params["layers"][0]["wq"]["q"]),
        )
        assert loaded["embed"].dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(loaded["embed"].astype(jnp.float32)),
            np.asarray(params["embed"].astype(jnp.float32)),
        )


class TestLoaderFamilies:
    def test_load_qwen2_bias(self, tmp_path):
        cfg = llama.tiny_config(quant="w4a16", qkv_bias=True)
        params = llama.init_weights(cfg, jax.random.PRNGKey(2))
        _write_hf_checkpoint(tmp_path, params, cfg)
        loaded = load_llama(tmp_path, cfg)
        want = llama.quantize_weights(params, cfg)
        for i in range(cfg.n_layers):
            for bname in ("bq", "bk", "bv"):
                np.testing.assert_array_equal(
                    np.asarray(loaded["layers"][i][bname].astype(jnp.float32)),
                    np.asarray(want["layers"][i][bname].astype(jnp.float32)),
                )
        toks = jax.random.randint(jax.random.PRNGKey(3), (1, 12), 0,
                                  cfg.vocab_size)
        got = llama.forward(loaded, toks, cfg, kernels=False)
        ref = llama.forward(want, toks, cfg, kernels=False)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_load_qwen2_bias_fused(self, tmp_path):
        cfg = llama.tiny_config(quant="w4a16", qkv_bias=True, fuse_qkv=True)
        base = llama.tiny_config(quant="bf16", qkv_bias=True)
        params = llama.init_weights(base, jax.random.PRNGKey(4))
        _write_hf_checkpoint(tmp_path, params, base)
        loaded = load_llama(tmp_path, cfg)
        assert "bqkv" in loaded["layers"][0]
        want = llama.quantize_weights(params, cfg)
        np.testing.assert_array_equal(
            np.asarray(loaded["layers"][0]["bqkv"].astype(jnp.float32)),
            np.asarray(want["layers"][0]["bqkv"].astype(jnp.float32)),
        )

    def test_load_mixtral_moe(self, tmp_path):
        cfg = llama.tiny_config(quant="int8", n_experts=4)
        base = llama.tiny_config(quant="bf16", n_experts=4)
        params = llama.init_weights(base, jax.random.PRNGKey(5))
        _write_hf_checkpoint(tmp_path, params, base)
        loaded = load_llama(tmp_path, cfg)
        want = llama.quantize_weights(params, cfg)
        for i in range(cfg.n_layers):
            for key in ("w_gate", "w_up", "w_down"):
                np.testing.assert_array_equal(
                    np.asarray(loaded["layers"][i]["moe"][key]["q"]),
                    np.asarray(want["layers"][i]["moe"][key]["q"]),
                    err_msg=f"layer {i} moe {key}",
                )
        toks = jax.random.randint(jax.random.PRNGKey(6), (1, 12), 0,
                                  cfg.vocab_size)
        got = llama.forward(loaded, toks, cfg, kernels=False)
        ref = llama.forward(want, toks, cfg, kernels=False)
        # router stays fp; expert int8 leaves bit-match -> logits bit-match
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
