"""GPT-2-family decoder: the second model family on the kernel stack.

Exercises the operator surface the Llama model does not: multi-head
attention (no GQA), learned position embeddings (no rotary), LayerNorm
with bias (the Pallas layernorm kernel, not RMSNorm), fused
bias+gelu epilogues on the MLP (CK's AddFastGelu functor), and tied
embeddings. Weight-only quantization reuses the S2 dequant GEMMs
unchanged — the point: one kernel catalog serves unrelated families.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from composable_kernel_tpu.models.llama import _linear, _quantize_kv
from composable_kernel_tpu.ops import epilogues as ep
from composable_kernel_tpu.ops.attention import flash_attention
from composable_kernel_tpu.ops.normalization import layernorm
from composable_kernel_tpu.reference.quant import (
    ref_quantize_group,
    ref_quantize_per_channel,
)


@dataclass(frozen=True)
class GPT2Config:
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    vocab_size: int = 50257
    max_seq_len: int = 1024
    norm_eps: float = 1e-5
    quant: str = "bf16"  # "bf16" | "int8" | "w4a16"
    group_size: int = 64
    tp_pack: int = 1
    fuse_qkv: bool = False  # GPT-2 checkpoints ship fused c_attn already
    dtype: str = "bfloat16"

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def tiny_gpt2(**kw) -> GPT2Config:
    base = dict(dim=128, n_layers=2, n_heads=4, ffn_dim=256, vocab_size=256,
                max_seq_len=128)
    base.update(kw)
    return GPT2Config(**base)


def init_weights(cfg: GPT2Config, key) -> dict:
    d, f, v = cfg.dim, cfg.ffn_dim, cfg.vocab_size
    keys = iter(jax.random.split(key, cfg.n_layers * 4 + 2))
    std = 0.02

    def mat(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(cfg.jdtype)

    layers = []
    for _ in range(cfg.n_layers):
        layers.append(
            {
                "ln1_g": jnp.ones((d,), jnp.float32),
                "ln1_b": jnp.zeros((d,), jnp.float32),
                "w_qkv": mat(next(keys), (d, 3 * d)),
                "b_qkv": jnp.zeros((3 * d,), jnp.float32),
                "w_proj": mat(next(keys), (d, d)),
                "b_proj": jnp.zeros((d,), jnp.float32),
                "ln2_g": jnp.ones((d,), jnp.float32),
                "ln2_b": jnp.zeros((d,), jnp.float32),
                "w_fc": mat(next(keys), (d, f)),
                "b_fc": jnp.zeros((f,), jnp.float32),
                "w_out": mat(next(keys), (f, d)),
                "b_out": jnp.zeros((d,), jnp.float32),
            }
        )
    return {
        "wte": mat(next(keys), (v, d)),
        "wpe": mat(next(keys), (cfg.max_seq_len, d)),
        "layers": layers,
        "lnf_g": jnp.ones((d,), jnp.float32),
        "lnf_b": jnp.zeros((d,), jnp.float32),
    }


_GPT2_QUANT = ("w_qkv", "w_proj", "w_fc", "w_out")


def quantize_weights(params, cfg: GPT2Config) -> dict:
    if cfg.quant == "bf16":
        return params

    def qone(w):
        if cfg.quant == "int8":
            q, s = ref_quantize_per_channel(w, bits=8)
            return {"q": q, "s": s}
        from composable_kernel_tpu import dtypes

        q, s = ref_quantize_group(w, group_size=cfg.group_size, bits=4)
        return {"q": dtypes.pack_int4(q, axis=0), "s": s}

    out = dict(params)
    out["layers"] = [
        {k: (qone(v) if k in _GPT2_QUANT else v) for k, v in layer.items()}
        for layer in params["layers"]
    ]
    return out


def forward(params, tokens, cfg: GPT2Config, *, kernels=True, interpret=None):
    """tokens [B, S] -> logits [B, S, V] (tied embeddings)."""
    b, s = tokens.shape
    x = jnp.take(params["wte"], tokens, axis=0) + params["wpe"][None, :s].astype(
        cfg.jdtype
    )

    for layer in params["layers"]:
        h = layernorm(x, layer["ln1_g"], layer["ln1_b"], eps=cfg.norm_eps,
                      interpret=interpret)
        qkv = _linear(h.reshape(b * s, -1), layer["w_qkv"], cfg, interpret, kernels)
        qkv = qkv.astype(jnp.float32) + layer["b_qkv"]
        q, k, v = jnp.split(qkv.astype(x.dtype), 3, axis=-1)
        hd, nh = cfg.head_dim, cfg.n_heads
        q = q.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        if kernels:
            o = flash_attention(q, k, v, causal=True, interpret=interpret)
        else:
            from composable_kernel_tpu.reference.attention import ref_attention

            o = ref_attention(q, k, v, causal=True)
        o = o.transpose(0, 2, 1, 3).reshape(b * s, -1)
        o = _linear(o, layer["w_proj"], cfg, interpret, kernels)
        o = (o.astype(jnp.float32) + layer["b_proj"]).astype(x.dtype)
        x = x + o.reshape(b, s, -1)

        h = layernorm(x, layer["ln2_g"], layer["ln2_b"], eps=cfg.norm_eps,
                      interpret=interpret)
        # MLP with the CK AddFastGelu fused epilogue (bias + gelu in-kernel)
        h2 = _linear(h.reshape(b * s, -1), layer["w_fc"], cfg, interpret, kernels)
        h2 = ep.fast_gelu(h2.astype(jnp.float32) + layer["b_fc"]).astype(x.dtype)
        o = _linear(h2, layer["w_out"], cfg, interpret, kernels)
        o = (o.astype(jnp.float32) + layer["b_out"]).astype(x.dtype)
        x = x + o.reshape(b, s, -1)

    x = layernorm(x, params["lnf_g"], params["lnf_b"], eps=cfg.norm_eps,
                  interpret=interpret)
    logits = jnp.matmul(
        x.reshape(b * s, -1).astype(jnp.float32),
        params["wte"].astype(jnp.float32).T,
    )
    return logits.reshape(b, s, -1).astype(cfg.jdtype)
