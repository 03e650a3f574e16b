"""Llama-family model built on the quantized kernel stack.

The S4 end-to-end slice (SURVEY.md §7): a Llama-3-class decoder wired from

  - S2 weight-only quantized GEMMs (``ops.quant.wo_quant_gemm`` — W4A16
    group-wise / W8A16 per-channel, dequant fused pre-MXU),
  - S3 flash attention (prefill) + split-KV flash decode, int8 KV option,
  - jnp RMSNorm / rotary / SwiGLU (XLA fuses these into neighbors).

The reference has no model zoo (CK is a kernel library consumed by e.g.
MIGraphX); this module plays the role of CK's ``client_example`` layer — the
proof that the operator surface composes into a real workload — and is the
BASELINE.json Llama-3-8B W4A16 north-star vehicle.

Tensor-parallel convention (supplied natively; absent in the reference —
SURVEY.md §2.6): when ``tp_axis`` is set the module expects to run inside
``shard_map`` with weights pre-sharded column-wise (q/k/v/gate/up: N dim)
or row-wise (o/down: K dim), and inserts one ``lax.psum`` after each
row-parallel matmul — the Megatron split on XLA collectives over ICI.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.ops.attention import flash_attention, flash_decode
from composable_kernel_tpu.ops.gemm.api import gemm as pallas_gemm_api
from composable_kernel_tpu.ops.quant import wo_quant_gemm
from composable_kernel_tpu.reference.quant import (
    ref_quantize_group,
    ref_quantize_per_channel,
)


# Path-fired evidence (VERDICT r4 #7 — the admission-bug failure class:
# a parity test that silently compares a path against itself). Bumped at
# Python-dispatch time when a fast-path branch is SELECTED: callers outside
# jit (the unit tests) see every call; jitted callers see one bump per
# trace, which still proves which branch was traced. Parity tests snapshot
# before / assert-delta after. CK analog: profile_gemm_impl.hpp's
# verify-the-instance-you-run discipline.
path_counters: Counter = Counter()


@dataclass(frozen=True)
class LlamaConfig:
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    n_kv_heads: int = 8
    ffn_dim: int = 14336
    vocab_size: int = 128256
    norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    max_seq_len: int = 8192
    # "bf16" | "int8" (per-channel W8A16) | "w4a16" (group-wise packed int4)
    # | "w4a8" (group-wise int4 weights + per-token int8 activations on the
    #   int8 MXU — AND-only unpack, see ops/quant/w4a8.py)
    # | "w8a8" (per-channel int8 weights + per-token int8 activations —
    #   the SmoothQuant-style dynamic path, same leaves as "int8")
    quant: str = "w4a16"
    group_size: int = 128
    # int4 pack segmentation for row-parallel weights (wo/w_down): pack in
    # tp_pack independent K blocks so a tp_pack-way shard of the packed rows
    # hands each device a self-contained split-halves matrix. 1 = no TP.
    tp_pack: int = 1
    # fuse qkv and gate/up projections into single wide GEMMs (fewer kernel
    # launches + wider contiguous weight streams at decode). Single-device
    # optimization: incompatible with TP column sharding (the concat
    # boundary would split across shards), so keep False when sharding.
    fuse_qkv: bool = False
    # KV-cache storage: "bf16" (model dtype) or "int8" (per-head symmetric
    # scales calibrated at prefill; dequant fused at attention load — the
    # int8-KV config of BASELINE.json, halving cache HBM traffic)
    kv_quant: str = "bf16"
    # Mistral/Qwen-style sliding-window attention: each query attends the
    # last `sliding_window` keys only (flash kernels skip dead blocks, so
    # long-context decode cost is O(window) not O(seq))
    sliding_window: int | None = None
    # Mixtral-style MoE FFN: n_experts > 0 replaces the dense SwiGLU with
    # top-k routed experts (models.moe — ragged grouped GEMM dispatch on
    # the kernel path, dense einsum on the reference path)
    n_experts: int = 0
    top_k_experts: int = 2
    # Qwen2-style additive bias on the q/k/v projections (biases stay
    # full-precision under every quant mode; single-device or DP — column
    # TP would need bias sharding, unimplemented)
    qkv_bias: bool = False
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def llama3_8b(**kw) -> LlamaConfig:
    return LlamaConfig(**kw)


def mistral7b(**kw) -> LlamaConfig:
    """Mistral-7B-v0.1 architecture: Llama stack + sliding-window 4096."""
    base = dict(
        dim=4096, n_layers=32, n_heads=32, n_kv_heads=8, ffn_dim=14336,
        vocab_size=32000, rope_theta=10000.0, sliding_window=4096,
    )
    base.update(kw)
    return LlamaConfig(**base)


def qwen2_7b(**kw) -> LlamaConfig:
    """Qwen2-7B architecture: Llama stack + q/k/v projection biases."""
    base = dict(
        dim=3584, n_layers=28, n_heads=28, n_kv_heads=4, ffn_dim=18944,
        vocab_size=152064, rope_theta=1e6, max_seq_len=32768, qkv_bias=True,
    )
    base.update(kw)
    return LlamaConfig(**base)


def mixtral8x7b(**kw) -> LlamaConfig:
    """Mixtral-8x7B architecture: Mistral attention stack + 8-expert
    top-2 MoE FFN."""
    base = dict(
        dim=4096, n_layers=32, n_heads=32, n_kv_heads=8, ffn_dim=14336,
        vocab_size=32000, rope_theta=1e6, n_experts=8, top_k_experts=2,
    )
    base.update(kw)
    return LlamaConfig(**base)


def _moe_cfg(cfg: LlamaConfig):
    from composable_kernel_tpu.models.moe import MoEConfig

    return MoEConfig(
        dim=cfg.dim, ffn_dim=cfg.ffn_dim, n_experts=cfg.n_experts,
        top_k=cfg.top_k_experts, dtype=cfg.dtype,
    )


def tiny_config(**kw) -> LlamaConfig:
    """Test-sized config (CI / dryrun)."""
    base = dict(
        dim=256, n_layers=2, n_heads=8, n_kv_heads=4, ffn_dim=512,
        vocab_size=512, max_seq_len=256, group_size=64,
    )
    base.update(kw)
    return LlamaConfig(**base)


# ---------------------------------------------------------------- weights ---


def init_weights(cfg: LlamaConfig, key) -> dict:
    """Random bf16 weights (testing / benchmarking without a checkpoint)."""
    d, f, v = cfg.dim, cfg.ffn_dim, cfg.vocab_size
    hd, nh, nkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    keys = iter(jax.random.split(key, cfg.n_layers * 10 + 3))
    std = d ** -0.5

    def mat(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * std).astype(cfg.jdtype)

    layers = []
    for _ in range(cfg.n_layers):
        layer = {
            "attn_norm": jnp.ones((d,), cfg.jdtype),
            "wq": mat(next(keys), (d, nh * hd)),
            "wk": mat(next(keys), (d, nkv * hd)),
            "wv": mat(next(keys), (d, nkv * hd)),
            "wo": mat(next(keys), (nh * hd, d)),
            "ffn_norm": jnp.ones((d,), cfg.jdtype),
        }
        if cfg.qkv_bias:
            # random (not zero) so tests catch any dropped-bias wiring
            layer["bq"] = (jax.random.normal(next(keys), (nh * hd,),
                                             jnp.float32) * 0.1).astype(cfg.jdtype)
            layer["bk"] = (jax.random.normal(next(keys), (nkv * hd,),
                                             jnp.float32) * 0.1).astype(cfg.jdtype)
            layer["bv"] = (jax.random.normal(next(keys), (nkv * hd,),
                                             jnp.float32) * 0.1).astype(cfg.jdtype)
        if cfg.n_experts > 0:
            from composable_kernel_tpu.models.moe import init_moe_weights

            layer["moe"] = init_moe_weights(_moe_cfg(cfg), next(keys))
        else:
            layer.update(
                w_gate=mat(next(keys), (d, f)),
                w_up=mat(next(keys), (d, f)),
                w_down=mat(next(keys), (f, d)),
            )
        layers.append(layer)
    return {
        "embed": mat(next(keys), (v, d)),
        "layers": layers,
        "norm": jnp.ones((d,), cfg.jdtype),
        "lm_head": mat(next(keys), (d, v)),
    }


def random_quantized_params(cfg: LlamaConfig, key) -> dict:
    """Generate the quantized pytree directly on device (benchmarking).

    No bf16 intermediate: a full bf16 8B copy would not fit on HBM next to
    the quantized one. Weight *values* are irrelevant to bandwidth/compute
    benchmarks; only shapes/dtypes matter. One jit call so per-tensor
    dispatches through a proxied runtime don't dominate.
    """
    assert cfg.quant in ("w4a16", "w4a8"), cfg.quant
    d, f, v, g = cfg.dim, cfg.ffn_dim, cfg.vocab_size, cfg.group_size
    hd, nh, nkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
    keys = iter(jax.random.split(key, cfg.n_layers * 7 + 3))

    def qlin(k_, kk, nn):
        packed = jax.random.randint(k_, (kk // 2, nn), -128, 128, jnp.int8)
        scales = jnp.full((kk // g, nn), 0.004, jnp.float32)
        return {"q": packed, "s": scales}

    layers = []
    for _ in range(cfg.n_layers):
        layer = {
            "attn_norm": jnp.ones((d,), cfg.jdtype),
            "wo": qlin(next(keys), nh * hd, d),
            "ffn_norm": jnp.ones((d,), cfg.jdtype),
            "w_down": qlin(next(keys), f, d),
        }
        if cfg.fuse_qkv:
            layer["wqkv"] = qlin(next(keys), d, (nh + 2 * nkv) * hd)
            layer["w_gateup"] = qlin(next(keys), d, 2 * f)
        else:
            layer["wq"] = qlin(next(keys), d, nh * hd)
            layer["wk"] = qlin(next(keys), d, nkv * hd)
            layer["wv"] = qlin(next(keys), d, nkv * hd)
            layer["w_gate"] = qlin(next(keys), d, f)
            layer["w_up"] = qlin(next(keys), d, f)
        layers.append(layer)
    std = 0.02
    return {
        "embed": (jax.random.normal(next(keys), (v, d), jnp.float32) * std).astype(cfg.jdtype),
        "layers": layers,
        "norm": jnp.ones((d,), cfg.jdtype),
        "lm_head": qlin(next(keys), d, v),
    }


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
#: row-parallel (K-sharded) linears under TP — need segmented int4 packing
_ROW_PARALLEL = ("wo", "w_down")


def prepare_params(params: dict, cfg: LlamaConfig) -> dict:
    """Load-time weight prep for single-device serving (after quantization).

    Wraps each 2-D quantized linear whose decode N-block cannot divide N in
    an ``ops.quant.prepared.PreparedWeights``, so the weight pad + scale
    expansion happen ONCE here instead of inside every decode step (XLA
    does not hoist them out of scan/fori loops; the vocab-sized lm_head
    N=128256 otherwise pays a ~263 MB HBM pad copy per token). Leaves whose
    heuristic block divides N stay raw: measured, the in-jit scale gather
    lands in scoped VMEM and slightly beats the prepared layout there.

    CK analog: device-op ``MakeArgument`` descriptor precomputation
    (``device_gemm_dequantB.hpp:24``). Apply AFTER gptq/awq quantization
    and only for the kernel serving path (``kernels=True``).
    """
    from composable_kernel_tpu.ops.quant import (
        prepare_w4a8,
        prepare_w8a8,
        prepare_wo_quant,
    )
    from composable_kernel_tpu.ops.quant.api import _decode_bn
    from composable_kernel_tpu.ops.quant.w4a8 import _w4a8_heuristic

    if cfg.quant not in ("w4a16", "int8", "w4a8", "w8a8"):
        return params

    def needs_prep(k: int, n: int) -> bool:
        if cfg.quant in ("w4a8", "w8a8"):
            bn = _w4a8_heuristic(8, n, k).block_n
        else:
            bn = _decode_bn(n)
        return n % bn != 0

    def prep_leaf(w):
        if not (isinstance(w, dict) and "q" in w and w["q"].ndim == 2):
            return w
        kb, n = w["q"].shape
        k = kb * 2 if cfg.quant in ("w4a16", "w4a8") else kb
        if not needs_prep(k, n):
            return w
        if cfg.quant == "w4a8":
            return prepare_w4a8(w["q"], w["s"], group_size=cfg.group_size)
        if cfg.quant == "w8a8":
            return prepare_w8a8(w["q"], w["s"])
        if cfg.quant == "w4a16":
            return prepare_wo_quant(w["q"], w["s"], group_size=cfg.group_size,
                                    packed_int4=True)
        return prepare_wo_quant(w["q"], w["s"])  # int8 per-channel

    out = dict(params)
    out["layers"] = [
        {kk: prep_leaf(vv) for kk, vv in layer.items()}
        for layer in params["layers"]
    ]
    if isinstance(params.get("lm_head"), dict):
        out["lm_head"] = prep_leaf(params["lm_head"])
    return out


def quantize_weights(params: dict, cfg: LlamaConfig) -> dict:
    """bf16 params -> quantized per ``cfg.quant``.

    w4a16: symmetric int4, group ``cfg.group_size`` along K, packed
    two-per-byte (dtypes.pack_int4 split-halves). int8: per-channel.
    Linear leaves become {"q": packed int8, "s": f32 scales}.
    """
    if cfg.quant == "bf16":
        return params

    def quant_one(w, row_parallel=False):
        if cfg.quant in ("int8", "w8a8"):
            w_q, s = ref_quantize_per_channel(w, bits=8)
            return {"q": w_q, "s": s}
        if cfg.quant in ("w4a16", "w4a8"):
            w_q, s = ref_quantize_group(w, group_size=cfg.group_size, bits=4)
            blocks = cfg.tp_pack if row_parallel else 1
            pack = dtypes.pack_int4 if cfg.quant == "w4a16" else dtypes.pack_int4_w4a8
            return {"q": pack(w_q, axis=0, blocks=blocks), "s": s}
        raise ValueError(cfg.quant)

    def quant_moe(moe_w):
        from composable_kernel_tpu.models.moe import quantize_moe_weights

        if cfg.quant == "w4a8":
            return quantize_moe_weights(
                moe_w, mode="w4a8", group_size=cfg.group_size
            )
        # int8 / w8a8 / w4a16 experts all ride the per-channel-int8
        # grouped path (no group-wise int4 ragged W4A16 kernel: the
        # int8-MXU w4a8 ragged variant covers the int4-expert case)
        return quantize_moe_weights(moe_w, mode="w8a16")

    out = dict(params)
    new_layers = []
    for layer in params["layers"]:
        if cfg.fuse_qkv:
            layer = dict(layer)
            layer["wqkv"] = jnp.concatenate(
                [layer.pop("wq"), layer.pop("wk"), layer.pop("wv")], axis=1
            )
            if "bq" in layer:
                layer["bqkv"] = jnp.concatenate(
                    [layer.pop("bq"), layer.pop("bk"), layer.pop("bv")]
                )
            layer["w_gateup"] = jnp.concatenate(
                [layer.pop("w_gate"), layer.pop("w_up")], axis=1
            )
        new_layers.append(
            {
                k: (
                    quant_one(v, row_parallel=k in _ROW_PARALLEL)
                    if k in _QUANT_KEYS or k in ("wqkv", "w_gateup")
                    else quant_moe(v) if k == "moe" else v
                )
                for k, v in layer.items()
            }
        )
    out["layers"] = new_layers
    out["lm_head"] = quant_one(params["lm_head"])
    return out


# ------------------------------------------------------------------ layers ---


def _add_resid(res, d):
    # fused residual-add epilogue: res is the f32 accumulator tile, d the
    # bf16 residual block — one f32 add before the output cast (vs a
    # separate [T, D] XLA kernel per fusion site per layer)
    return res + d.astype(res.dtype)


def _linear(x, w, cfg: LlamaConfig, interpret=None, kernels=True,
            global_k=None, resid=None):
    """2D x [T, K] @ weight — dispatches on quantization mode.

    ``kernels=False`` switches to the pure-jnp reference path (differentiable
    — the training-step route; flash kernels get a custom VJP in a later
    stage), numerically matching the kernel per the S0 reference contract.
    ``global_k``: unsharded K of a row-parallel weight — used to derive the
    local int4 pack segmentation (under TP each shard holds a self-contained
    sub-pack, so local blocks = tp_pack * K_local / K_global).
    ``resid``: optional [T, N] residual added INSIDE the GEMM epilogue
    (CK multiple-D Add, device_gemm_multiple_d.hpp:33) on the fused kernel
    paths; jnp-added otherwise. The decode layers use it for the
    attention-out and FFN-down residual connections.
    """
    from composable_kernel_tpu.ops.quant.prepared import PreparedWeights

    r_ds = () if resid is None else (resid,)
    r_op = None if resid is None else _add_resid

    if isinstance(w, PreparedWeights):
        # load-time prepared leaf (prepare_params) — kernel serving only
        assert kernels, "prepared weights have no reference path"
        if cfg.quant == "w4a8":
            from composable_kernel_tpu.ops.quant import w4a8_gemm

            if isinstance(x, _FusedNorm):
                # megakernel: rmsnorm + act-quant + GEMM, one launch
                return w4a8_gemm(x.x2, None, w, ds=r_ds, c_op=r_op,
                                 gamma=x.gamma,
                                 norm_eps=cfg.norm_eps, out_dtype=cfg.jdtype,
                                 interpret=interpret)
            if isinstance(x, tuple):
                x_q, x_s = x  # pre-quantized by the fused rmsnorm_quant
                return w4a8_gemm(x_q, x_s, w, ds=r_ds, c_op=r_op,
                                 out_dtype=cfg.jdtype,
                                 interpret=interpret)
            return w4a8_gemm(x, None, w, ds=r_ds, c_op=r_op,
                             out_dtype=cfg.jdtype,
                             interpret=interpret)
        if cfg.quant == "w8a8":
            from composable_kernel_tpu.ops.quant import (
                quantize_act_token,
                w8a8_gemm,
            )

            if isinstance(x, tuple):
                x_q, x_s = x  # pre-quantized by the fused rmsnorm_quant
            else:
                x_q, x_s = quantize_act_token(x)
            out = w8a8_gemm(x_q, x_s, w, out_dtype=cfg.jdtype,
                            interpret=interpret)
            # the per-token a_scale applies after the kernel epilogue, so
            # the residual lands here; XLA fuses it into the same
            # elementwise pass as the scale multiply
            return out if resid is None else (out + resid).astype(out.dtype)
        out = wo_quant_gemm(x, w, ds=r_ds, c_op=r_op, interpret=interpret)
        return out
    if isinstance(w, dict):
        pack_blocks = 1
        if cfg.quant in ("w4a16", "w4a8") and global_k is not None:
            k_local = (x[0] if isinstance(x, tuple) else x).shape[-1]
            pack_blocks = max(1, cfg.tp_pack * k_local // global_k)
        if cfg.quant == "w8a8":
            from composable_kernel_tpu.ops.quant import (
                quantize_act_token,
                w8a8_gemm,
            )

            if not kernels:
                # reference: exact int32 dot + both scale families in f32
                x_f = x[0].astype(jnp.float32) if isinstance(x, tuple) else None
                if isinstance(x, tuple):
                    x_q, x_s = x
                else:
                    from composable_kernel_tpu.reference.quant import (
                        ref_quantize_act_token,
                    )

                    x_q, x_s = ref_quantize_act_token(x)
                acc = jnp.matmul(
                    x_q.astype(jnp.int32), w["q"].astype(jnp.int32),
                    preferred_element_type=jnp.int32,
                )
                out = acc.astype(jnp.float32) * jnp.asarray(w["s"], jnp.float32)
                out = (out * x_s).astype(cfg.jdtype)
                return out if resid is None else (out + resid).astype(out.dtype)
            if isinstance(x, tuple):
                x_q, x_s = x
            else:
                x_q, x_s = quantize_act_token(x)
            out = w8a8_gemm(
                x_q, x_s, w["q"], w["s"], out_dtype=cfg.jdtype,
                interpret=interpret,
            )
            return out if resid is None else (out + resid).astype(out.dtype)
        if cfg.quant == "w4a8":
            from composable_kernel_tpu.ops.quant import (
                quantize_act_token,
                w4a8_gemm,
            )

            if isinstance(x, _FusedNorm):
                assert kernels
                return w4a8_gemm(
                    x.x2, None, w["q"], w["s"], ds=r_ds, c_op=r_op,
                    group_size=cfg.group_size,
                    pack_blocks=pack_blocks, gamma=x.gamma,
                    norm_eps=cfg.norm_eps, out_dtype=cfg.jdtype,
                    interpret=interpret,
                )
            if not kernels:
                assert not isinstance(x, tuple)
                from composable_kernel_tpu.reference.quant import (
                    ref_quantize_act_token,
                    ref_w4a8_gemm,
                )

                x_q, x_s = ref_quantize_act_token(x)
                w_int4 = dtypes.unpack_int4_w4a8(w["q"], blocks=pack_blocks)
                out = ref_w4a8_gemm(
                    x_q, x_s, w_int4, w["s"], group_size=cfg.group_size,
                    out_dtype=x.dtype,
                )
                return out if resid is None else (out + resid).astype(out.dtype)
            if isinstance(x, tuple):
                # pre-quantized input from the fused rmsnorm_quant kernel
                x_q, x_s = x
            else:
                x_q, x_s = quantize_act_token(x)
            return w4a8_gemm(
                x_q, x_s, w["q"], w["s"], ds=r_ds, c_op=r_op,
                group_size=cfg.group_size,
                pack_blocks=pack_blocks, out_dtype=cfg.jdtype,
                interpret=interpret,
            )
        if not kernels:
            from composable_kernel_tpu.reference.quant import ref_dequant_gemm

            if cfg.quant == "int8":
                out = ref_dequant_gemm(x, w["q"], w["s"])
            else:
                out = ref_dequant_gemm(
                    x, w["q"], w["s"], group_size=cfg.group_size,
                    packed_int4=True, pack_blocks=pack_blocks,
                )
            return out if resid is None else (out + resid).astype(out.dtype)
        if cfg.quant == "int8":
            return wo_quant_gemm(x, w["q"], w["s"], ds=r_ds, c_op=r_op,
                                 interpret=interpret)
        return wo_quant_gemm(
            x, w["q"], w["s"], r_ds, c_op=r_op,
            group_size=cfg.group_size, packed_int4=True,
            pack_blocks=pack_blocks, interpret=interpret,
        )
    if not kernels:
        out = jnp.matmul(
            x, w, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        return out if resid is None else (out + resid).astype(out.dtype)
    out = pallas_gemm_api(x, w, interpret=interpret)
    return out if resid is None else (out + resid).astype(out.dtype)


class _FusedNorm(NamedTuple):
    """Raw activations + rmsnorm gamma: the norm+act-quant fuse INTO the
    W4A8 GEMM (``w4a8_gemm(x, None, w, gamma=...)`` — the decode
    megakernel front, one pallas launch per projection group instead of
    rmsnorm_quant + GEMM). ``_linear`` unwraps it on the w4a8 kernel path;
    other quant modes must not receive one."""

    x2: Any       # [T, D] raw bf16/f32
    gamma: Any    # [D]


def _norm_quant_2d(x, gamma, cfg: LlamaConfig, interpret=None):
    """Norm front for the quantized decode GEMMs.

    w4a8: returns a :class:`_FusedNorm` — the rmsnorm + per-token int8
    quant run INSIDE the GEMM kernel (zero extra launches). w8a8: runs the
    fused ``rmsnorm_quant`` kernel and returns the (x_q, scales) tuple
    (its GEMM has no fused-norm front yet). Both skip the separate
    absmax/round XLA passes whose launch glue outweighed the GEMM win at
    B=1 (docs/performance.md).
    """
    d = x.shape[-1]
    if cfg.quant == "w4a8":
        return _FusedNorm(x.reshape(-1, d), gamma)
    from composable_kernel_tpu.ops import normalization as norm_ops

    q, s = norm_ops.rmsnorm_quant(
        x, gamma, eps=cfg.norm_eps, interpret=interpret
    )
    return q.reshape(-1, d), s.reshape(-1, 1)


def rmsnorm(x, gamma, eps, kernels=True, interpret=None):
    """RMSNorm. ``kernels=True`` routes to the Pallas fwd/bwd kernel pair
    (ops.normalization.rmsnorm, custom VJP) so the E2E decode/prefill and
    train_step paths exercise the normalization kernels (CK
    device_normalization_fwd/_bwd parity); ``kernels=False`` is the
    inline-jnp reference path used by CPU parity tests."""
    if kernels:
        from composable_kernel_tpu.ops import normalization as norm_ops

        return norm_ops.rmsnorm(x, gamma, eps=eps, interpret=interpret)
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps) * gamma.astype(jnp.float32)).astype(x.dtype)


def rope_cos_sin(positions, head_dim, theta):
    """positions [..] int -> (cos, sin) [.., head_dim/2] f32."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x, cos, sin):
    """x [B, H, S, D]; cos/sin [S, D/2] or [B, S, D/2]. Rotate-half form."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    if cos.ndim == 3:  # per-slot positions: [B, S, D/2] -> [B, 1, S, D/2]
        cos = cos[:, None]
        sin = sin[:, None]
    else:
        cos = cos[None, None]
        sin = sin[None, None]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def _qkv_proj(x2, layer, cfg: LlamaConfig, interpret=None, kernels=True):
    """Shared q/k/v projection on flattened [T, D] input: fused or split
    weights, optional Qwen2-style additive bias (bias stays fp under every
    quant mode; added post-GEMM, XLA fuses it into the epilogue)."""

    def _bias(t, b_):
        return (t.astype(jnp.float32) + b_.astype(jnp.float32)).astype(t.dtype)

    hd = cfg.head_dim
    if "wqkv" in layer:
        qkv = _linear(x2, layer["wqkv"], cfg, interpret, kernels)
        if "bqkv" in layer:
            qkv = _bias(qkv, layer["bqkv"])
        # proportional split: under TP the shard-local fused projection is
        # (nh + 2*nkv)*hd/tp wide with the same head ratio (the
        # permute_fused_for_tp layout), so local segment sizes derive from
        # the actual output width rather than the global config
        ratio = cfg.n_heads + 2 * cfg.n_kv_heads
        n_q = qkv.shape[-1] * cfg.n_heads // ratio
        n_kv = qkv.shape[-1] * cfg.n_kv_heads // ratio
        return qkv[:, :n_q], qkv[:, n_q : n_q + n_kv], qkv[:, n_q + n_kv :]
    q = _linear(x2, layer["wq"], cfg, interpret, kernels)
    k = _linear(x2, layer["wk"], cfg, interpret, kernels)
    v = _linear(x2, layer["wv"], cfg, interpret, kernels)
    if "bq" in layer:
        q, k, v = _bias(q, layer["bq"]), _bias(k, layer["bk"]), _bias(v, layer["bv"])
    return q, k, v


def _attn_block(
    x, layer, cfg: LlamaConfig, cos, sin, *, cache=None, pos=None,
    kv_seq_len=None, tp_axis=None, interpret=None, kernels=True,
):
    """Returns (out [B, S, D_model], updated (k_cache, v_cache) or None).

    Prefill: cache is None -> flash attention over the fresh K/V (causal).
    Decode: cache = (k_cache, v_cache) [B, Hkv, max_seq, hd]; new K/V written
    at ``pos`` and split-KV flash decode runs over the cache.
    """
    b, s, _ = x.shape
    hd = cfg.head_dim

    x2 = x.reshape(b * s, -1)
    q, k, v = _qkv_proj(x2, layer, cfg, interpret, kernels)
    # local head counts derive from the (possibly TP-sharded) weight shapes
    nh, nkv = q.shape[-1] // hd, k.shape[-1] // hd
    q = q.reshape(b, s, nh, hd)
    k = k.reshape(b, s, nkv, hd)
    v = v.reshape(b, s, nkv, hd)
    q = q.transpose(0, 2, 1, 3)  # [B, H, S, hd]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache is None:
        if kernels:
            o = flash_attention(
                q, k, v, causal=True, window=cfg.sliding_window,
                kv_seq_len=kv_seq_len, interpret=interpret,
            )
        else:
            from composable_kernel_tpu.reference.attention import ref_attention

            o = ref_attention(q, k, v, causal=True,
                              window=cfg.sliding_window, kv_seq_len=kv_seq_len)
        new_cache = (k, v)
    else:
        is_i8 = "ks" in cache
        k_in = _quantize_kv(k, cache["ks"]) if is_i8 else k
        v_in = _quantize_kv(v, cache["vs"]) if is_i8 else v
        new_cache = dict(cache)
        new_cache["k"] = jax.lax.dynamic_update_slice(
            cache["k"], k_in.astype(cache["k"].dtype), (0, 0, pos, 0)
        )
        new_cache["v"] = jax.lax.dynamic_update_slice(
            cache["v"], v_in.astype(cache["v"].dtype), (0, 0, pos, 0)
        )
        lens = jnp.full((b,), pos + s, jnp.int32) if kv_seq_len is None else kv_seq_len
        scales = (
            {"k_scale": cache["ks"], "v_scale": cache["vs"]} if is_i8 else {}
        )
        if kernels:
            o = flash_decode(
                q, new_cache["k"], new_cache["v"], kv_seq_len=lens,
                window=cfg.sliding_window, interpret=interpret, **scales,
            )
        else:
            from composable_kernel_tpu.reference.attention import ref_attention

            kf, vf = new_cache["k"], new_cache["v"]
            if is_i8:
                kf = (kf.astype(jnp.float32) * cache["ks"][:, :, None, None]).astype(q.dtype)
                vf = (vf.astype(jnp.float32) * cache["vs"][:, :, None, None]).astype(q.dtype)
            o = ref_attention(q, kf, vf, kv_seq_len=lens,
                              window=cfg.sliding_window,
                              q_offset=None if cfg.sliding_window is None
                              else lens - s)

    o = o.transpose(0, 2, 1, 3).reshape(b * s, nh * hd)
    o = _linear(o, layer["wo"], cfg, interpret, kernels, global_k=cfg.dim)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)  # row-parallel output projection
    return o.reshape(b, s, -1), new_cache


def _ffn_block(x, layer, cfg: LlamaConfig, *, tp_axis=None, interpret=None, kernels=True):
    b, s, d = x.shape
    return _ffn_core(
        x.reshape(b * s, d), (b, s, d), layer, cfg,
        tp_axis=tp_axis, interpret=interpret, kernels=kernels,
    )


def _ffn_core(x2, bsd, layer, cfg: LlamaConfig, *, tp_axis=None,
              interpret=None, kernels=True, resid=None):
    """SwiGLU FFN on a flattened [B*S, D] input (or a pre-quantized
    (x_q, scales) tuple from the fused W4A8 norm).

    ``resid``: optional [B*S, D] residual — the output then INCLUDES the
    residual connection, fused into the down-projection GEMM epilogue on
    kernel paths (requires ``tp_axis=None``: under TP the psum must see
    the partial product alone).

    Mixtral MoE layers (``"moe" in layer``) route here to the top-k expert
    block: ragged grouped-GEMM dispatch on the kernel path, dense einsum on
    the reference path (quantized stacks dequantized first — the einsum is
    the f32 golden reference)."""
    b, s, d = bsd
    assert resid is None or tp_axis is None, (
        "fused FFN residual requires tp_axis=None (the psum must reduce "
        "the bare partial product)"
    )
    if "moe" in layer:
        from composable_kernel_tpu.models import moe as moe_mod

        assert not isinstance(x2, tuple), (
            "MoE routing needs raw activations (fused norm-quant tuples "
            "take the unfused path for MoE layers)"
        )
        mcfg = _moe_cfg(cfg)
        if tp_axis is not None:
            # Expert parallelism rides the tp mesh axis (shard_params puts
            # each device's expert shard on dim 0 of the stacks). The
            # activations are tp-replicated at this point, so the kernel
            # path splits tokens across the axis, runs the capacity-bucketed
            # all-to-all dispatch (moe_block_ep), and all_gathers back to
            # the replicated layout the surrounding attention TP expects.
            ep = jax.lax.psum(1, tp_axis)
            t = x2.shape[0]
            if kernels:
                # pad the token rows to a multiple of ep so EVERY batch
                # (including decode's tiny ones) takes the all-to-all
                # kernel path — the old dense fallback dequantized the
                # full [E, K, N] expert stacks to f32 inside every traced
                # decode step (advisor r2 finding). Pad tokens route
                # normally but their outputs are sliced off.
                t_pad = -(-t // ep) * ep
                x_p = (
                    jnp.pad(x2, ((0, t_pad - t), (0, 0)))
                    if t_pad != t else x2
                )
                n_loc = t_pad // ep
                x_loc = jax.lax.dynamic_slice_in_dim(
                    x_p, jax.lax.axis_index(tp_axis) * n_loc, n_loc, 0
                )
                o_loc = moe_mod.moe_block_ep(
                    x_loc, layer["moe"], mcfg, ep_axis=tp_axis,
                    interpret=interpret,
                )
                o = jax.lax.all_gather(o_loc, tp_axis, axis=0, tiled=True)[:t]
            else:
                # replicated-token psum fallback (the dense reference path)
                w = layer["moe"]
                if isinstance(w["w_gate"], dict):
                    w = moe_mod.dequantize_moe_weights(w)
                o = moe_mod.moe_block(
                    x2.astype(cfg.jdtype), w, mcfg, ep_axis=tp_axis
                )
            return o.reshape(b, s, d).astype(cfg.jdtype)
        if kernels:
            o = moe_mod.moe_block_ragged(
                x2, layer["moe"], mcfg, interpret=interpret
            )
        else:
            w = layer["moe"]
            if isinstance(w["w_gate"], dict):
                w = moe_mod.dequantize_moe_weights(w)
            o = moe_mod.moe_block(x2.astype(cfg.jdtype), w, mcfg)
        o = o.reshape(b, s, d).astype(cfg.jdtype)
        return o if resid is None else o + resid.reshape(b, s, d)
    if "w_gateup" in layer:
        gu = _linear(x2, layer["w_gateup"], cfg, interpret, kernels)
        f_loc = gu.shape[-1] // 2
        g, u = gu[:, :f_loc], gu[:, f_loc:]
    else:
        g = _linear(x2, layer["w_gate"], cfg, interpret, kernels)
        u = _linear(x2, layer["w_up"], cfg, interpret, kernels)
    h = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(
        cfg.jdtype
    )
    o = _linear(h, layer["w_down"], cfg, interpret, kernels,
                global_k=cfg.ffn_dim, resid=resid)
    if tp_axis is not None:
        o = jax.lax.psum(o, tp_axis)  # row-parallel down projection
    return o.reshape(b, s, d)


# ----------------------------------------------------------------- forward ---


def forward(
    params,
    tokens,
    cfg: LlamaConfig,
    *,
    kv_seq_len=None,
    tp_axis=None,
    interpret=None,
    kernels: bool = True,
    return_cache: bool = False,
):
    """Prefill forward: tokens [B, S] int32 -> logits [B, S, V].

    ``return_cache``: also return per-layer (K, V) lists for decode seeding.
    """
    b, s = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0)
    positions = jnp.arange(s)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    caches = []
    for layer in params["layers"]:
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps, kernels, interpret)
        attn_out, kv = _attn_block(
            h, layer, cfg, cos, sin, kv_seq_len=kv_seq_len, tp_axis=tp_axis,
            interpret=interpret, kernels=kernels,
        )
        x = x + attn_out
        h = rmsnorm(x, layer["ffn_norm"], cfg.norm_eps, kernels, interpret)
        x = x + _ffn_block(
            h, layer, cfg, tp_axis=tp_axis, interpret=interpret, kernels=kernels
        )
        if return_cache:
            caches.append(kv)

    x = rmsnorm(x, params["norm"], cfg.norm_eps, kernels, interpret)
    logits = _linear(x.reshape(b * s, -1), params["lm_head"], cfg, interpret, kernels)
    logits = logits.reshape(b, s, -1)
    if return_cache:
        return logits, caches
    return logits


def forward_varlen(
    params,
    tokens,
    starts,
    lens,
    cfg: LlamaConfig,
    *,
    block: int = 1024,
    block_q: int = 512,
    block_k: int = 1024,
    interpret=None,
    kernels: bool = True,
    return_cache: bool = False,
):
    """Packed group-mode prefill: B ragged prompts in ONE forward.

    CK fmha group mode at the model level (fmha_fwd_kernel.hpp:505-555):
    ``tokens [T]`` packs every prompt contiguously with each sequence's
    start aligned to ``block`` (``ops.attention.pack_varlen`` layout —
    pad rows carry token id 0 and produce garbage that is never read).
    ``starts/lens [B]`` give each prompt's packed offset and true length;
    starts must be multiples of ``block``, and ``block_q``/``block_k``
    must divide ``block`` (one packed stream serves both the Q and KV
    sides of the attention).

    Mixed-length admission pays sum(ceil(len/block)) rows instead of
    B * max(len): the serving engine batches its queued prompts through
    here instead of one padded/per-request forward each.

    Returns last-token logits ``[B, V]`` (the only rows serving needs —
    the vocab GEMM runs on B rows, not T), plus per-layer packed
    ``(k, v) [T, Hkv, hd]`` seeds when ``return_cache`` (slice row ranges
    per slot and transpose for ``seed_kv_cache``).
    """
    from composable_kernel_tpu.ops.attention import flash_attention_varlen

    assert block % block_q == 0 and block % block_k == 0, (
        block, block_q, block_k
    )
    (t,) = tokens.shape
    starts = jnp.asarray(starts, jnp.int32)
    lens = jnp.asarray(lens, jnp.int32)
    hd = cfg.head_dim

    x = jnp.take(params["embed"], tokens, axis=0)[None]  # [1, T, D]
    # per-token position inside its own sequence
    row = jnp.arange(t, dtype=jnp.int32)
    seq = jnp.searchsorted(starts, row, side="right") - 1
    positions = row - starts[seq]
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta)  # [T, hd/2]
    cos_t = cos[None, :, :]  # [1, T, hd/2] -> broadcast over heads below
    sin_t = sin[None, :, :]

    caches = []
    for layer in params["layers"]:
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps, kernels, interpret)
        q, k, v = _qkv_proj(h.reshape(t, -1), layer, cfg, interpret, kernels)
        nh, nkv = q.shape[-1] // hd, k.shape[-1] // hd
        q = q.reshape(t, nh, hd).transpose(1, 0, 2)  # [H, T, hd]
        k = k.reshape(t, nkv, hd).transpose(1, 0, 2)
        v = v.reshape(t, nkv, hd).transpose(1, 0, 2)
        q = apply_rope(q[None], cos_t, sin_t)[0]
        k = apply_rope(k[None], cos_t, sin_t)[0]
        if kernels:
            o = flash_attention_varlen(
                q.transpose(1, 0, 2), k.transpose(1, 0, 2),
                v.transpose(1, 0, 2), starts, lens, starts, lens,
                causal=True, window=cfg.sliding_window,
                block_q=block_q, block_k=block_k, interpret=interpret,
            )  # [T, H, hd]
        else:
            from composable_kernel_tpu.reference.attention import (
                ref_attention_varlen,
            )

            o = ref_attention_varlen(
                q.transpose(1, 0, 2), k.transpose(1, 0, 2),
                v.transpose(1, 0, 2), starts, lens,
                window=cfg.sliding_window,
            )
        if return_cache:
            caches.append((k.transpose(1, 0, 2), v.transpose(1, 0, 2)))
        o = o.reshape(t, nh * hd)
        o = _linear(o, layer["wo"], cfg, interpret, kernels, global_k=cfg.dim)
        x = x + o.reshape(1, t, -1)
        h = rmsnorm(x, layer["ffn_norm"], cfg.norm_eps, kernels, interpret)
        x = x + _ffn_block(h, layer, cfg, interpret=interpret, kernels=kernels)

    last = jnp.clip(starts + lens - 1, 0, t - 1)
    x_last = jnp.take(x[0], last, axis=0)  # [B, D]
    x_last = rmsnorm(x_last[None], params["norm"], cfg.norm_eps, kernels,
                     interpret)[0]
    logits = _linear(x_last, params["lm_head"], cfg, interpret, kernels)
    if return_cache:
        return logits, caches
    return logits


def init_kv_cache(cfg: LlamaConfig, batch: int, *, n_kv_heads=None, dtype=None):
    """[n_layers] list of cache dicts {"k","v"[,"ks","vs"]}.

    K/V are [B, Hkv, max_seq, hd]; with ``cfg.kv_quant == "int8"`` they are
    int8 with per-(B, Hkv) f32 scales (prefill-calibrated).
    """
    nkv = n_kv_heads or cfg.n_kv_heads
    shape = (batch, nkv, cfg.max_seq_len, cfg.head_dim)
    if cfg.kv_quant == "int8":
        return [
            {
                "k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "ks": jnp.ones((batch, nkv), jnp.float32),
                "vs": jnp.ones((batch, nkv), jnp.float32),
            }
            for _ in range(cfg.n_layers)
        ]
    dt = dtype or cfg.jdtype
    return [
        {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}
        for _ in range(cfg.n_layers)
    ]


def _quantize_kv(x, scale):
    """x [B,Hkv,S,hd] -> int8 rows with per-(B,Hkv) scale."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale[:, :, None, None]), -127, 127
    ).astype(jnp.int8)


def seed_kv_cache(cache, seeds, cfg: LlamaConfig, *, slot: int = 0):
    """Write prefill (K, V) seeds into cache position [slot, :, 0:S).

    int8 mode calibrates the per-head scales from the prefill absmax
    (CK-style static quantization: decode tokens reuse these scales).
    Seeds may have batch > 1 only when slot == 0 and shapes match.
    """
    out = []
    for entry, (k, v) in zip(cache, seeds):
        b_seed = k.shape[0]
        at = (slot, 0, 0, 0)
        if cfg.kv_quant == "int8":
            ks = jnp.maximum(
                jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(2, 3)) / 127.0, 1e-6
            )
            vs = jnp.maximum(
                jnp.max(jnp.abs(v.astype(jnp.float32)), axis=(2, 3)) / 127.0, 1e-6
            )
            new = dict(entry)
            new["k"] = jax.lax.dynamic_update_slice(
                entry["k"], _quantize_kv(k, ks), at
            )
            new["v"] = jax.lax.dynamic_update_slice(
                entry["v"], _quantize_kv(v, vs), at
            )
            new["ks"] = jax.lax.dynamic_update_slice(entry["ks"], ks, (slot, 0))
            new["vs"] = jax.lax.dynamic_update_slice(entry["vs"], vs, (slot, 0))
        else:
            new = dict(entry)
            new["k"] = jax.lax.dynamic_update_slice(
                entry["k"], k.astype(entry["k"].dtype), at
            )
            new["v"] = jax.lax.dynamic_update_slice(
                entry["v"], v.astype(entry["v"].dtype), at
            )
        out.append(new)
    return out


def decode_step(
    params,
    cache,
    tokens,
    pos,
    cfg: LlamaConfig,
    *,
    tp_axis=None,
    interpret=None,
    kernels: bool = True,
):
    """One decode step: tokens [B, 1] at position ``pos`` (traced scalar ok).

    Returns (logits [B, 1, V], updated cache). The cache is functionally
    updated — donate it under jit for in-place HBM updates.
    """
    b, s = tokens.shape
    x = jnp.take(params["embed"], tokens, axis=0)
    positions = pos + jnp.arange(s)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    new_cache = []
    for layer, kv in zip(params["layers"], cache):
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps, kernels, interpret)
        attn_out, kv = _attn_block(
            h, layer, cfg, cos, sin, cache=kv, pos=pos, tp_axis=tp_axis,
            interpret=interpret, kernels=kernels,
        )
        x = x + attn_out
        h = rmsnorm(x, layer["ffn_norm"], cfg.norm_eps, kernels, interpret)
        x = x + _ffn_block(
            h, layer, cfg, tp_axis=tp_axis, interpret=interpret, kernels=kernels
        )
        new_cache.append(kv)

    x = rmsnorm(x, params["norm"], cfg.norm_eps, kernels, interpret)
    logits = _linear(x.reshape(b * s, -1), params["lm_head"], cfg, interpret, kernels)
    return logits.reshape(b, s, -1), new_cache


def generate_greedy(params, prompt, n_steps, cfg: LlamaConfig, *, interpret=None):
    """Greedy decoding demo: prompt [B, S] -> [B, S + n_steps].

    Prefill seeds the cache, then ``n_steps`` single-token decode steps.
    """
    b, s = prompt.shape
    logits, seeds = forward(params, prompt, cfg, interpret=interpret, return_cache=True)
    cache = seed_kv_cache(init_kv_cache(cfg, b), seeds, cfg)

    tokens = prompt
    next_tok = jnp.argmax(logits[:, -1:], axis=-1).astype(prompt.dtype)
    for i in range(n_steps):
        tokens = jnp.concatenate([tokens, next_tok], axis=1)
        if i == n_steps - 1:
            break
        logits, cache = decode_step(
            params, cache, next_tok, s + i, cfg, interpret=interpret
        )
        next_tok = jnp.argmax(logits[:, -1:], axis=-1).astype(prompt.dtype)
    return tokens


def _decode_layer(
    x,
    layer,
    kv,
    positions,
    cos_b,
    sin_b,
    cfg: LlamaConfig,
    *,
    tp_axis=None,
    interpret=None,
    kernels: bool = True,
    defer_kv: bool = False,
):
    """One transformer block at decode time: x [B, 1, D] -> (x, updated kv).

    Shared by ``decode_step_batched`` and the pipeline-parallel decode ring
    (parallel/pipeline.py), which applies it per stage via lax.scan.

    ``defer_kv``: skip the per-layer cache write — the fresh token's K/V
    fold into the attention kernel in-VMEM (``flash_decode(k_new=...)``)
    and the caller replays all layers' writes back-to-back at step
    end (consecutive slab-rewrite launches pipeline). Returns
    ``(x, kv-unchanged, (k_row, v_row))`` instead of ``(x, kv)``.
    """
    b, s = x.shape[:2]
    lens = positions + 1

    def upd(c, new):
        # per-slot dynamic row update at positions[b]
        return jax.vmap(
            lambda cb, nb, p: jax.lax.dynamic_update_slice(
                cb, nb.astype(cb.dtype), (0, p, 0)
            )
        )(c, new, positions)

    if cfg.quant in ("w4a8", "w8a8") and kernels:
        x2 = _norm_quant_2d(x, layer["attn_norm"], cfg, interpret)
    else:
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps, kernels, interpret)
        x2 = h.reshape(b * s, -1)
    hd = cfg.head_dim

    if (defer_kv and kernels and s == 1 and "wqkv" in layer
            and "bqkv" not in layer and kv["k"].shape[2] % 32 == 0
            and hd % 2 == 0):
        # fused glue path: ONE rope+quant+pack launch between the QKV GEMM
        # and the attention kernel (ops/rope_prep.py) replaces the per-
        # layer XLA chain (rope mults/concats, head transposes, KV quant,
        # the attention kernel's q pad+reshape, and the output transpose —
        # ~10 small launches whose overhead dwarfs their work at decode)
        from composable_kernel_tpu.ops.attention.paged import decode_attention
        from composable_kernel_tpu.ops.rope_prep import rope_quant_prep

        qkv = _linear(x2, layer["wqkv"], cfg, interpret, kernels)
        ratio = cfg.n_heads + 2 * cfg.n_kv_heads
        nh = qkv.shape[-1] * cfg.n_heads // ratio // hd
        nkv = qkv.shape[-1] * cfg.n_kv_heads // ratio // hd
        is_i8 = "ks" in kv
        q_p, k_new3, v_new3 = rope_quant_prep(
            qkv, cos_b.reshape(b, -1), sin_b.reshape(b, -1),
            n_heads=nh, n_kv_heads=nkv, head_dim=hd,
            k_scale=kv.get("ks"), v_scale=kv.get("vs"),
            interpret=interpret,
        )
        kn = k_new3 if k_new3.shape[-1] == hd else k_new3[..., :hd]
        vn = v_new3 if v_new3.shape[-1] == hd else v_new3[..., :hd]
        pending = (kn.reshape(b, nkv, 1, hd).astype(kv["k"].dtype),
                   vn.reshape(b, nkv, 1, hd).astype(kv["v"].dtype))
        scales = {"k_scale": kv["ks"], "v_scale": kv["vs"]} if is_i8 else {}
        o = decode_attention(
            None, kv["k"], kv["v"], kv_seq_len=positions,
            k_new=k_new3[..., : kv["k"].shape[-1]],
            v_new=v_new3[..., : kv["v"].shape[-1]],
            q_packed=(q_p, nh), out_layout="flat", block_k=1024,
            window=cfg.sliding_window, interpret=interpret, **scales,
        )  # [B, nh*hd] — the wo input layout, no transpose glue
        kv = dict(kv)
        if tp_axis is None:
            x = _linear(o, layer["wo"], cfg, interpret, kernels,
                        global_k=cfg.dim, resid=x.reshape(b * s, -1)
                        ).reshape(b, s, -1)
        else:
            o = _linear(o, layer["wo"], cfg, interpret, kernels,
                        global_k=cfg.dim)
            o = jax.lax.psum(o, tp_axis)
            x = x + o.reshape(b, s, -1)
        if cfg.quant in ("w4a8", "w8a8") and kernels and "moe" not in layer:
            x2f = _norm_quant_2d(x, layer["ffn_norm"], cfg, interpret)
            if tp_axis is None:
                x = _ffn_core(
                    x2f, (b, s, x.shape[-1]), layer, cfg,
                    tp_axis=None, interpret=interpret, kernels=kernels,
                    resid=x.reshape(b * s, -1),
                )
            else:
                x = x + _ffn_core(
                    x2f, (b, s, x.shape[-1]), layer, cfg,
                    tp_axis=tp_axis, interpret=interpret, kernels=kernels,
                )
        else:
            h = rmsnorm(x, layer["ffn_norm"], cfg.norm_eps, kernels,
                        interpret)
            x = x + _ffn_block(
                h, layer, cfg, tp_axis=tp_axis, interpret=interpret,
                kernels=kernels
            )
        return x, kv, pending

    q, k, v = _qkv_proj(x2, layer, cfg, interpret, kernels)
    nh, nkv = q.shape[-1] // hd, k.shape[-1] // hd
    q = q.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
    q = jnp.concatenate(
        [q[..., : hd // 2] * cos_b - q[..., hd // 2 :] * sin_b,
         q[..., hd // 2 :] * cos_b + q[..., : hd // 2] * sin_b], axis=-1
    ).astype(q.dtype)
    k = jnp.concatenate(
        [k[..., : hd // 2] * cos_b - k[..., hd // 2 :] * sin_b,
         k[..., hd // 2 :] * cos_b + k[..., : hd // 2] * sin_b], axis=-1
    ).astype(k.dtype)
    is_i8 = "ks" in kv
    k_in = _quantize_kv(k, kv["ks"]) if is_i8 else k
    v_in = _quantize_kv(v, kv["vs"]) if is_i8 else v
    kv = dict(kv)
    pending = None
    if defer_kv and kernels and s == 1 and kv["k"].shape[2] % 32 == 0:
        # deferred append: the fresh row folds into the attention kernel
        # (storage dtype, so the math matches a write+readback exactly) and
        # the cache write batches across layers in the caller
        path_counters["decode_deferred_append"] += 1
        pending = (k_in.astype(kv["k"].dtype), v_in.astype(kv["v"].dtype))
        scales = {"k_scale": kv["ks"], "v_scale": kv["vs"]} if is_i8 else {}
        o = flash_decode(
            q, kv["k"], kv["v"], kv_seq_len=positions,
            k_new=pending[0], v_new=pending[1],
            window=cfg.sliding_window, interpret=interpret, **scales,
        )
    elif kernels:
        if s == 1 and kv["k"].shape[2] % 32 == 0:
            # in-place slab-rewrite kernel: the jnp scatter costs ~52 us per
            # cache per layer at B=8 (ops/kv_update.py)
            path_counters["decode_kv_update_kernel"] += 1
            from composable_kernel_tpu.ops.kv_update import kv_cache_update

            kv["k"], kv["v"] = kv_cache_update(
                kv["k"], kv["v"], k_in.astype(kv["k"].dtype),
                v_in.astype(kv["v"].dtype), positions, interpret=interpret,
            )
        else:
            kv["k"] = upd(kv["k"], k_in)
            kv["v"] = upd(kv["v"], v_in)
        scales = {"k_scale": kv["ks"], "v_scale": kv["vs"]} if is_i8 else {}
        o = flash_decode(
            q, kv["k"], kv["v"], kv_seq_len=lens,
            window=cfg.sliding_window, interpret=interpret, **scales,
        )
    else:
        kv["k"] = upd(kv["k"], k_in)
        kv["v"] = upd(kv["v"], v_in)
        from composable_kernel_tpu.reference.attention import ref_attention

        kf, vf = kv["k"], kv["v"]
        if is_i8:
            kf = (kf.astype(jnp.float32) * kv["ks"][:, :, None, None]).astype(q.dtype)
            vf = (vf.astype(jnp.float32) * kv["vs"][:, :, None, None]).astype(q.dtype)
        o = ref_attention(q, kf, vf, kv_seq_len=lens,
                          window=cfg.sliding_window,
                          q_offset=None if cfg.sliding_window is None
                          else lens - s)
    o = o.transpose(0, 2, 1, 3).reshape(b * s, nh * hd)
    if tp_axis is None:
        # residual add fused into the wo GEMM epilogue (one launch)
        x = _linear(o, layer["wo"], cfg, interpret, kernels,
                    global_k=cfg.dim, resid=x.reshape(b * s, -1)
                    ).reshape(b, s, -1)
    else:
        o = _linear(o, layer["wo"], cfg, interpret, kernels, global_k=cfg.dim)
        o = jax.lax.psum(o, tp_axis)
        x = x + o.reshape(b, s, -1)
    if cfg.quant in ("w4a8", "w8a8") and kernels and "moe" not in layer:
        x2f = _norm_quant_2d(x, layer["ffn_norm"], cfg, interpret)
        if tp_axis is None:
            x = _ffn_core(
                x2f, (b, s, x.shape[-1]), layer, cfg,
                tp_axis=None, interpret=interpret, kernels=kernels,
                resid=x.reshape(b * s, -1),
            )
        else:
            x = x + _ffn_core(
                x2f, (b, s, x.shape[-1]), layer, cfg,
                tp_axis=tp_axis, interpret=interpret, kernels=kernels,
            )
    else:
        h = rmsnorm(x, layer["ffn_norm"], cfg.norm_eps, kernels, interpret)
        x = x + _ffn_block(
            h, layer, cfg, tp_axis=tp_axis, interpret=interpret, kernels=kernels
        )
    if defer_kv:
        return x, kv, pending
    return x, kv


def decode_step_batched(
    params,
    cache,
    tokens,
    positions,
    cfg: LlamaConfig,
    *,
    tp_axis=None,
    interpret=None,
    kernels: bool = True,
):
    """Continuous-batching decode: per-slot positions.

    tokens: [B, 1]; positions: [B] int32 — each batch slot decodes its own
    next position (slots run different sequences at different lengths, the
    continuous-batching invariant). KV rows are scattered per slot and
    attention masks per-slot via kv_seq_len = positions + 1.
    """
    b, s = tokens.shape
    assert s == 1
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)  # [B, d/2]
    cos_b = cos[:, None, None, :]  # [B, 1, 1, d/2] broadcastable over (H, S)
    sin_b = sin[:, None, None, :]

    new_cache = []
    pendings = []
    for layer, kv in zip(params["layers"], cache):
        x, kv, pending = _decode_layer(
            x, layer, kv, positions, cos_b, sin_b, cfg,
            tp_axis=tp_axis, interpret=interpret, kernels=kernels,
            defer_kv=True,
        )
        new_cache.append(kv)
        pendings.append(pending)

    if any(p is not None for p in pendings):
        # deferred cache writes, back-to-back at step end: consecutive
        # slab-rewrite launches pipeline at ~2 us each on v5e, vs ~23 us
        # when interleaved between the attention/GEMM kernels mid-layer
        # (probe_kv_update_all; a single many-ref launch is far worse —
        # per-grid-step DMAs serialize across refs: 3.4 ms for 64 caches)
        from composable_kernel_tpu.ops.kv_update import kv_cache_update

        for i, p in enumerate(pendings):
            if p is None:
                continue
            new_cache[i] = dict(new_cache[i])
            new_cache[i]["k"], new_cache[i]["v"] = kv_cache_update(
                new_cache[i]["k"], new_cache[i]["v"], p[0], p[1],
                positions, interpret=interpret,
            )

    from composable_kernel_tpu.ops.quant.prepared import PreparedWeights

    if (cfg.quant in ("w4a8", "w8a8") and kernels
            and isinstance(params["lm_head"], (dict, PreparedWeights))):
        x2 = _norm_quant_2d(x, params["norm"], cfg, interpret)
        logits = _linear(x2, params["lm_head"], cfg, interpret, kernels)
    else:
        x = rmsnorm(x, params["norm"], cfg.norm_eps, kernels, interpret)
        logits = _linear(
            x.reshape(b * s, -1), params["lm_head"], cfg, interpret, kernels
        )
    return logits.reshape(b, s, -1), new_cache


def prefill_chunk_step(
    params,
    cache,
    tokens,
    pos,
    cfg: LlamaConfig,
    *,
    interpret=None,
    kernels: bool = True,
    calibrate_scales: bool = False,
):
    """Process a prompt chunk [B, C] at positions [pos, pos+C) against the
    cache (chunked prefill: long prompts stream through fixed-size steps so
    decode slots are never starved — the serving-side continuous-batching
    complement; reference has no serving layer to compare).

    Causality: chunk query i attends cache keys < pos + i + 1, expressed
    via the flash kernel's dynamic causal_offset (= pos). Returns
    (logits [B, C, V], updated cache).

    ``pos`` may be a scalar (all rows share one offset — plain chunked
    prefill) or a [B] vector (per-slot offsets — the batched speculative
    verify step, where each sequence has diverged to its own length).
    """
    b, c = tokens.shape
    per_slot = jnp.ndim(pos) > 0
    x = jnp.take(params["embed"], tokens, axis=0)
    if per_slot:
        pos_v = jnp.asarray(pos, jnp.int32)                      # [B]
        positions = pos_v[:, None] + jnp.arange(c)[None, :]      # [B, C]
        lens = pos_v + c
        offs = pos_v
    else:
        positions = pos + jnp.arange(c)
        lens = jnp.full((b,), pos + c, jnp.int32)
        offs = jnp.full((b,), pos, jnp.int32)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    new_cache = []
    for layer, kv in zip(params["layers"], cache):
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps, kernels, interpret)
        x2 = h.reshape(b * c, -1)
        hd = cfg.head_dim
        q, k, v = _qkv_proj(x2, layer, cfg, interpret, kernels)
        nh, nkv = q.shape[-1] // hd, k.shape[-1] // hd
        q = q.reshape(b, c, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, c, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, c, nkv, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        is_i8 = "ks" in kv
        kv = dict(kv)
        if is_i8 and calibrate_scales:
            # first chunk: calibrate per-head scales from its absmax (the
            # static-quant calibration seed_kv_cache does for full prefill)
            kv["ks"] = jnp.maximum(
                jnp.max(jnp.abs(k.astype(jnp.float32)), axis=(2, 3)) / 127.0,
                1e-6,
            )
            kv["vs"] = jnp.maximum(
                jnp.max(jnp.abs(v.astype(jnp.float32)), axis=(2, 3)) / 127.0,
                1e-6,
            )
        k_in = _quantize_kv(k, kv["ks"]) if is_i8 else k
        v_in = _quantize_kv(v, kv["vs"]) if is_i8 else v
        if per_slot:

            def _upd(cb, nb, p):
                return jax.lax.dynamic_update_slice(
                    cb, nb.astype(cb.dtype), (0, p, 0)
                )

            kv["k"] = jax.vmap(_upd)(kv["k"], k_in, offs)
            kv["v"] = jax.vmap(_upd)(kv["v"], v_in, offs)
        else:
            kv["k"] = jax.lax.dynamic_update_slice(
                kv["k"], k_in.astype(kv["k"].dtype), (0, 0, pos, 0)
            )
            kv["v"] = jax.lax.dynamic_update_slice(
                kv["v"], v_in.astype(kv["v"].dtype), (0, 0, pos, 0)
            )
        scales = {"k_scale": kv["ks"], "v_scale": kv["vs"]} if is_i8 else {}
        if kernels and c <= 8:
            # small chunks against a long cache are bandwidth-bound, not
            # MXU-bound: the head-grouped single-stream kernel reads each
            # KV block once for ALL heads (the flash grid re-reads it per
            # query head) — the speculative-verify fast path. causal=True
            # places query i at lens-c+i = offs+i, matching the flash
            # causal_offset semantics.
            from composable_kernel_tpu.ops.attention import decode_attention

            o = decode_attention(
                q, kv["k"], kv["v"], kv_seq_len=lens, causal=True,
                interpret=interpret, **scales,
            )
        elif kernels:
            o = flash_attention(
                q, kv["k"], kv["v"], causal=True, kv_seq_len=lens,
                causal_offset=offs, interpret=interpret, **scales,
            )
        else:
            # inline reference: chunk query i attends keys <= pos + i
            # (ref_attention's fixed bottom-right alignment can't express
            # the mid-cache offset)
            kf, vf = kv["k"], kv["v"]
            if is_i8:
                kf = (kf.astype(jnp.float32) * kv["ks"][:, :, None, None])
                vf = (vf.astype(jnp.float32) * kv["vs"][:, :, None, None])
            rep = nh // nkv
            kf = jnp.repeat(kf.astype(jnp.float32), rep, axis=1)
            vf = jnp.repeat(vf.astype(jnp.float32), rep, axis=1)
            import math as _math

            att = jnp.einsum(
                "bhqd,bhkd->bhqk", q.astype(jnp.float32), kf
            ) / _math.sqrt(hd)
            kpos = jnp.arange(kf.shape[2])[None, None, None, :]
            qpos = (
                jnp.reshape(jnp.asarray(pos), (-1, 1, 1, 1))
                + jnp.arange(c)[None, None, :, None]
            )
            att = jnp.where(kpos <= qpos, att, -1e30)
            p_att = jax.nn.softmax(att, axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p_att, vf).astype(q.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b * c, nh * hd)
        o = _linear(o, layer["wo"], cfg, interpret, kernels, global_k=cfg.dim)
        x = x + o.reshape(b, c, -1)
        h = rmsnorm(x, layer["ffn_norm"], cfg.norm_eps, kernels, interpret)
        x = x + _ffn_block(h, layer, cfg, interpret=interpret, kernels=kernels)
        new_cache.append(kv)

    x = rmsnorm(x, params["norm"], cfg.norm_eps, kernels, interpret)
    logits = _linear(x.reshape(b * c, -1), params["lm_head"], cfg, interpret, kernels)
    return logits.reshape(b, c, -1), new_cache


def prefill_chunk_step_packed(
    params,
    cache,
    tokens,
    lens,
    slots,
    pos,
    cfg: LlamaConfig,
    *,
    interpret=None,
    kernels: bool = True,
    calibrate_scales: bool = False,
):
    """One packed chunk round over the LIVE entries of a chunked-prefill
    wave: the composition of the packed-varlen group mode
    (``forward_varlen`` / CK fmha_fwd_kernel.hpp:505-555) with chunked
    prefill (``prefill_chunk_step``), which neither covers alone — the
    batched chunk wave pays ``B_wave * ceil(max_len/c)`` chunk rows while
    this pays ``sum(ceil(len_i/c))`` (finished prompts drop out of later
    rounds instead of stepping on padding).

    tokens:  [E, c] — entry e's chunk rows (fixed span c; c % 128 == 0).
    lens:    [E] int32 in [0, c] — live rows; 0 marks a bucket-padding
             entry (no compute, no cache effect).
    slots:   [E] int32 — cache slot per entry (distinct for live
             entries; dead entries must point at a slot NO live entry
             writes this round — aliasing a live slot risks the stale
             double-buffer revert, see kv_cache_append_chunk).
    pos:     [E] int32 — the entry's cache write offset (a multiple of c;
             all live entries of round j sit at j*c).
    Returns ``(last_logits [E, V], cache)`` — last-row logits per entry
    (valid for entries whose prompt ends in this round).
    """
    from composable_kernel_tpu.ops.attention import (
        flash_attention_varlen_cache,
    )
    from composable_kernel_tpu.ops.kv_update import kv_cache_append_chunk

    e_n, c = tokens.shape
    assert c % 128 == 0, f"packed chunk span {c} must be a multiple of 128"
    t = e_n * c
    hd = cfg.head_dim
    lens = jnp.asarray(lens, jnp.int32)
    slots = jnp.asarray(slots, jnp.int32)
    pos = jnp.asarray(pos, jnp.int32)
    starts = jnp.arange(e_n, dtype=jnp.int32) * c  # fixed-span packing
    kv_lens = pos + lens

    x = jnp.take(params["embed"], tokens.reshape(t), axis=0)[None]  # [1,T,D]
    row = jnp.arange(t, dtype=jnp.int32)
    positions = pos[row // c] + row % c
    cos, sin = rope_cos_sin(positions, hd, cfg.rope_theta)  # [T, hd/2]

    row_c = jax.lax.broadcasted_iota(jnp.int32, (e_n, 1, c, 1), 2)
    live_rows = row_c < lens[:, None, None, None]

    new_cache = []
    for layer, kv in zip(params["layers"], cache):
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps, kernels, interpret)
        q, k, v = _qkv_proj(h.reshape(t, -1), layer, cfg, interpret, kernels)
        nh, nkv = q.shape[-1] // hd, k.shape[-1] // hd
        q = q.reshape(t, nh, hd).transpose(1, 0, 2)[None]
        k = k.reshape(t, nkv, hd).transpose(1, 0, 2)[None]
        q = apply_rope(q, cos, sin)[0].transpose(1, 0, 2)  # [T, nh, hd]
        k = apply_rope(k, cos, sin)[0].transpose(1, 0, 2)  # [T, nkv, hd]
        v3 = v.reshape(t, nkv, hd)

        # entry-major chunk blocks for the cache write
        k_e = k.reshape(e_n, c, nkv, hd).transpose(0, 2, 1, 3)
        v_e = v3.reshape(e_n, c, nkv, hd).transpose(0, 2, 1, 3)

        is_i8 = "ks" in kv
        kv = dict(kv)
        if is_i8 and calibrate_scales:
            # per-entry absmax over LIVE rows only (dead/pad rows carry
            # garbage), scattered to each entry's slot; dead entries must
            # not touch any slot's scale — one-hot blend instead of
            # .at[slots].set so a dead entry aliasing slot 0 is a no-op
            b_slots = kv["ks"].shape[0]
            absk = jnp.max(
                jnp.where(live_rows, jnp.abs(k_e.astype(jnp.float32)), 0.0),
                axis=(2, 3),
            )  # [E, Hkv]
            absv = jnp.max(
                jnp.where(live_rows, jnp.abs(v_e.astype(jnp.float32)), 0.0),
                axis=(2, 3),
            )
            ks_e = jnp.maximum(absk / 127.0, 1e-6)
            vs_e = jnp.maximum(absv / 127.0, 1e-6)
            onehot = (
                (slots[:, None] == jnp.arange(b_slots)[None, :])
                & (lens > 0)[:, None]
            ).astype(jnp.float32)  # [E, B]
            hit = jnp.sum(onehot, axis=0)[:, None]  # [B, 1]
            kv["ks"] = (
                jnp.einsum("eb,eh->bh", onehot, ks_e)
                + (1.0 - hit) * kv["ks"]
            )
            kv["vs"] = (
                jnp.einsum("eb,eh->bh", onehot, vs_e)
                + (1.0 - hit) * kv["vs"]
            )
        if is_i8:
            ks_g = kv["ks"][slots]  # [E, Hkv]
            vs_g = kv["vs"][slots]
            k_w = jnp.clip(
                jnp.round(k_e.astype(jnp.float32) / ks_g[:, :, None, None]),
                -127, 127,
            ).astype(jnp.int8)
            v_w = jnp.clip(
                jnp.round(v_e.astype(jnp.float32) / vs_g[:, :, None, None]),
                -127, 127,
            ).astype(jnp.int8)
        else:
            k_w = k_e.astype(kv["k"].dtype)
            v_w = v_e.astype(kv["v"].dtype)

        if kernels:
            kv["k"], kv["v"] = kv_cache_append_chunk(
                kv["k"], kv["v"], k_w, v_w, slots, pos, lens,
                interpret=interpret,
            )
        else:
            for ei in range(e_n):
                cur_k = jax.lax.dynamic_slice(
                    kv["k"], (slots[ei], 0, pos[ei], 0), (1, nkv, c, hd)
                )
                cur_v = jax.lax.dynamic_slice(
                    kv["v"], (slots[ei], 0, pos[ei], 0), (1, nkv, c, hd)
                )
                sel = live_rows[ei][None]
                kv["k"] = jax.lax.dynamic_update_slice(
                    kv["k"], jnp.where(sel, k_w[ei][None], cur_k),
                    (slots[ei], 0, pos[ei], 0),
                )
                kv["v"] = jax.lax.dynamic_update_slice(
                    kv["v"], jnp.where(sel, v_w[ei][None], cur_v),
                    (slots[ei], 0, pos[ei], 0),
                )

        scales = (
            {"k_scale": kv["ks"], "v_scale": kv["vs"]} if is_i8 else {}
        )
        if kernels:
            o = flash_attention_varlen_cache(
                q, kv["k"], kv["v"], starts, lens, kv_lens,
                slot_ids=slots, window=cfg.sliding_window,
                # largest q block dividing the span: small blocks double
                # the per-block KV streaming (measured 1.47 vs 1.05 ms at
                # c=512 with bq=256 — each q block walks the whole prefix)
                block_q=next(b for b in (512, 256, 128) if c % b == 0),
                block_k=next(b for b in (1024, 512, 256, 128)
                             if kv["k"].shape[2] % b == 0),
                interpret=interpret, **scales,
            )  # [T, nh, hd]
        else:
            from composable_kernel_tpu.reference.attention import (
                ref_attention_varlen_cache,
            )
            import numpy as _np

            cache_for_ref_k = kv["k"][_np.asarray(slots)]
            cache_for_ref_v = kv["v"][_np.asarray(slots)]
            o = ref_attention_varlen_cache(
                q, cache_for_ref_k, cache_for_ref_v,
                _np.asarray(starts), _np.asarray(lens), _np.asarray(kv_lens),
                k_scale=kv["ks"][_np.asarray(slots)] if is_i8 else None,
                v_scale=kv["vs"][_np.asarray(slots)] if is_i8 else None,
                window=cfg.sliding_window,
            )
        o = o.reshape(t, nh * hd)
        o = _linear(o, layer["wo"], cfg, interpret, kernels, global_k=cfg.dim)
        x = x + o.reshape(1, t, -1)
        h = rmsnorm(x, layer["ffn_norm"], cfg.norm_eps, kernels, interpret)
        x = x + _ffn_block(h, layer, cfg, interpret=interpret, kernels=kernels)
        new_cache.append(kv)

    last = starts + jnp.clip(lens - 1, 0, c - 1)
    x_last = jnp.take(x[0], last, axis=0)  # [E, D]
    x_last = rmsnorm(x_last[None], params["norm"], cfg.norm_eps, kernels,
                     interpret)[0]
    logits = _linear(x_last, params["lm_head"], cfg, interpret, kernels)
    return logits, new_cache


# ------------------------------------------------------------- paged cache ---


def init_paged_cache(cfg: LlamaConfig, n_pages: int, page: int,
                     batch_slots: int | None = None):
    """[n_layers] list of {"k","v"[,"ks","vs"]} page pools [P, Hkv, page, hd].

    One shared block table addresses every layer (allocation pattern is
    identical across layers, so per-layer tables would be copies). Page 0
    is the null/dead-DMA target and never allocated. With
    ``cfg.kv_quant == "int8"`` pools are int8 and per-(slot, Hkv) scales
    ride alongside (sized by ``batch_slots``; prefill-calibrated like the
    contiguous cache, seed_kv_cache).
    """
    shape = (n_pages, cfg.n_kv_heads, page, cfg.head_dim)
    if cfg.kv_quant == "int8":
        assert batch_slots is not None, "int8 paged cache needs batch_slots"
        return [
            {
                "k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "ks": jnp.ones((batch_slots, cfg.n_kv_heads), jnp.float32),
                "vs": jnp.ones((batch_slots, cfg.n_kv_heads), jnp.float32),
            }
            for _ in range(cfg.n_layers)
        ]
    return [
        {"k": jnp.zeros(shape, cfg.jdtype), "v": jnp.zeros(shape, cfg.jdtype)}
        for _ in range(cfg.n_layers)
    ]


def paged_decode_step(
    params,
    pools,
    table,
    tokens,
    positions,
    cfg: LlamaConfig,
    *,
    page: int,
    interpret=None,
    kernels: bool = True,
):
    """One decode step over the paged KV pool: (logits, updated pools).

    pools:     init_paged_cache output (list per layer).
    table:     [B, max_pages] int32 shared block table; pages for position
               ``positions[b]`` must already be allocated.
    tokens:    [B, 1]; positions: [B].
    New K/V rows scatter into page ``table[b, pos // page]`` at offset
    ``pos % page``; attention runs the single-stream paged kernel
    (ops.attention.paged_flash_decode).
    """
    from composable_kernel_tpu.ops.attention import paged_flash_decode

    b, s = tokens.shape
    assert s == 1
    x = jnp.take(params["embed"], tokens, axis=0)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    cos_b = cos[:, None, None, :]
    sin_b = sin[:, None, None, :]
    lens = positions + 1
    batch_ix = jnp.arange(b)
    pg = table[batch_ix, positions // page]  # [B]
    off = positions % page

    new_pools = []
    pending = []
    hd = cfg.head_dim
    for layer, pool in zip(params["layers"], pools):
        if cfg.quant in ("w4a8", "w8a8") and kernels:
            # fused rmsnorm + per-token int8 quant (decode_step_batched's
            # _decode_layer path — the paged step gets the same treatment)
            x2 = _norm_quant_2d(x, layer["attn_norm"], cfg, interpret)
        else:
            h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps, kernels, interpret)
            x2 = h.reshape(b, -1)
        pool = dict(pool)
        is_i8 = "ks" in pool
        scales = (
            {"k_scale": pool["ks"], "v_scale": pool["vs"]} if is_i8 else {}
        )
        if (kernels and "wqkv" in layer and "bqkv" not in layer
                and pool["k"].shape[2] % 32 == 0 and hd % 2 == 0):
            # fused glue path: rope+quant+pack in one launch + deferred
            # append with in-VMEM fold-in (see _decode_layer)
            path_counters["paged_rope_prep_fused"] += 1
            from composable_kernel_tpu.ops.rope_prep import rope_quant_prep

            qkv = _linear(x2, layer["wqkv"], cfg, interpret, kernels)
            ratio = cfg.n_heads + 2 * cfg.n_kv_heads
            nh = qkv.shape[-1] * cfg.n_heads // ratio // hd
            nkv = qkv.shape[-1] * cfg.n_kv_heads // ratio // hd
            q_p, k_new3, v_new3 = rope_quant_prep(
                qkv, cos_b.reshape(b, -1), sin_b.reshape(b, -1),
                n_heads=nh, n_kv_heads=nkv, head_dim=hd,
                k_scale=pool.get("ks"), v_scale=pool.get("vs"),
                interpret=interpret,
            )
            kn = k_new3 if k_new3.shape[-1] == hd else k_new3[..., :hd]
            vn = v_new3 if v_new3.shape[-1] == hd else v_new3[..., :hd]
            pending.append((kn.reshape(b, nkv, 1, hd).astype(pool["k"].dtype),
                            vn.reshape(b, nkv, 1, hd).astype(pool["v"].dtype)))
            o = paged_flash_decode(
                None, pool["k"], pool["v"], table, positions,
                k_new=k_new3[..., : pool["k"].shape[-1]],
                v_new=v_new3[..., : pool["v"].shape[-1]],
                q_packed=(q_p, nh), out_layout="flat",
                window=cfg.sliding_window, interpret=interpret, **scales,
            )  # [B, nh*hd]
        else:
            q, k, v = _qkv_proj(x2, layer, cfg, interpret, kernels)
            nh, nkv = q.shape[-1] // hd, k.shape[-1] // hd
            q = q.reshape(b, 1, nh, hd).transpose(0, 2, 1, 3)
            k = k.reshape(b, 1, nkv, hd).transpose(0, 2, 1, 3)
            v = v.reshape(b, 1, nkv, hd).transpose(0, 2, 1, 3)
            q = jnp.concatenate(
                [q[..., : hd // 2] * cos_b - q[..., hd // 2 :] * sin_b,
                 q[..., hd // 2 :] * cos_b + q[..., : hd // 2] * sin_b],
                axis=-1,
            ).astype(q.dtype)
            k = jnp.concatenate(
                [k[..., : hd // 2] * cos_b - k[..., hd // 2 :] * sin_b,
                 k[..., hd // 2 :] * cos_b + k[..., : hd // 2] * sin_b],
                axis=-1,
            ).astype(k.dtype)
            k_in = _quantize_kv(k, pool["ks"]) if is_i8 else k
            v_in = _quantize_kv(v, pool["vs"]) if is_i8 else v
            if kernels and pool["k"].shape[2] % 32 == 0:
                # deferred append: the fresh row folds into the paged
                # attention kernel in-VMEM; pool writes replay at step end
                path_counters["paged_deferred_append"] += 1
                pending.append((k_in.astype(pool["k"].dtype),
                                v_in.astype(pool["v"].dtype)))
                o = paged_flash_decode(
                    q, pool["k"], pool["v"], table, positions,
                    k_new=pending[-1][0], v_new=pending[-1][1],
                    window=cfg.sliding_window, interpret=interpret, **scales,
                )
            else:
                pending.append(None)
                # vectorized page scatter: (pg[b], :, off[b]) <- k[b, :, 0]
                pool["k"] = pool["k"].at[pg, :, off].set(
                    k_in[:, :, 0, :].astype(pool["k"].dtype)
                )
                pool["v"] = pool["v"].at[pg, :, off].set(
                    v_in[:, :, 0, :].astype(pool["v"].dtype)
                )
                o = paged_flash_decode(
                    q, pool["k"], pool["v"], table, lens,
                    window=cfg.sliding_window, interpret=interpret, **scales,
                )
            o = o.transpose(0, 2, 1, 3).reshape(b, nh * hd)
        if kernels:
            # residual add fused into the wo GEMM epilogue
            x = _linear(o, layer["wo"], cfg, interpret, kernels,
                        global_k=cfg.dim, resid=x.reshape(b, -1)
                        ).reshape(b, 1, -1)
        else:
            o = _linear(o, layer["wo"], cfg, interpret, kernels,
                        global_k=cfg.dim)
            x = x + o.reshape(b, 1, -1)
        if cfg.quant in ("w4a8", "w8a8") and kernels and "moe" not in layer:
            x2f = _norm_quant_2d(x, layer["ffn_norm"], cfg, interpret)
            x = _ffn_core(
                x2f, (b, 1, x.shape[-1]), layer, cfg,
                interpret=interpret, kernels=kernels,
                resid=x.reshape(b, -1),
            )
        else:
            h = rmsnorm(x, layer["ffn_norm"], cfg.norm_eps, kernels, interpret)
            x = x + _ffn_block(h, layer, cfg, interpret=interpret,
                               kernels=kernels)
        new_pools.append(pool)

    if any(p is not None for p in pending):
        # deferred pool writes, back-to-back at step end (see
        # decode_step_batched: consecutive slab-rewrite launches pipeline;
        # many-ref single launches serialize their per-step DMAs)
        from composable_kernel_tpu.ops.kv_update import kv_cache_update_paged

        for i, p in enumerate(pending):
            if p is None:
                continue
            new_pools[i] = dict(new_pools[i])
            new_pools[i]["k"], new_pools[i]["v"] = kv_cache_update_paged(
                new_pools[i]["k"], new_pools[i]["v"], p[0], p[1],
                pg, off, interpret=interpret,
            )

    from composable_kernel_tpu.ops.quant.prepared import PreparedWeights

    if (cfg.quant in ("w4a8", "w8a8") and kernels
            and isinstance(params["lm_head"], (dict, PreparedWeights))):
        x2 = _norm_quant_2d(x, params["norm"], cfg, interpret)
        logits = _linear(x2, params["lm_head"], cfg, interpret, kernels)
    else:
        x = rmsnorm(x, params["norm"], cfg.norm_eps, kernels, interpret)
        logits = _linear(x.reshape(b, -1), params["lm_head"], cfg, interpret,
                         kernels)
    return logits.reshape(b, 1, -1), new_pools


def paged_prefill_chunk_step(
    params,
    pools,
    table,
    tokens,
    pos,
    cfg: LlamaConfig,
    *,
    page: int,
    interpret=None,
    kernels: bool = True,
):
    """Chunk step over the paged KV pool: the speculative verify step's
    paged composition. Processes tokens [B, C] at per-slot positions
    [pos[b], pos[b]+C) — chunk rows scatter into their pages (straddling
    page boundaries is fine: one scatter per chunk offset) and attention
    runs the paged kernel with in-chunk causality
    (ops.attention.paged.paged_flash_decode(causal=True)).

    Returns (logits [B, C, V], updated pools). Contiguous counterpart:
    prefill_chunk_step's per-slot offset mode.
    """
    from composable_kernel_tpu.ops.attention import paged_flash_decode

    b, c = tokens.shape
    pos_v = jnp.asarray(pos, jnp.int32)
    assert pos_v.ndim == 1, "paged chunk step is per-slot (pos: [B])"
    x = jnp.take(params["embed"], tokens, axis=0)
    positions = pos_v[:, None] + jnp.arange(c)[None, :]  # [B, C]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    lens = pos_v + c
    batch_ix = jnp.arange(b)

    new_pools = []
    hd = cfg.head_dim
    for layer, pool in zip(params["layers"], pools):
        h = rmsnorm(x, layer["attn_norm"], cfg.norm_eps, kernels, interpret)
        x2 = h.reshape(b * c, -1)
        q, k, v = _qkv_proj(x2, layer, cfg, interpret, kernels)
        nh, nkv = q.shape[-1] // hd, k.shape[-1] // hd
        q = q.reshape(b, c, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, c, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, c, nkv, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        pool = dict(pool)
        is_i8 = "ks" in pool
        k_in = _quantize_kv(k, pool["ks"]) if is_i8 else k
        v_in = _quantize_kv(v, pool["vs"]) if is_i8 else v
        if kernels and page % 32 == 0:
            # slab-rewrite chunk append (ops/kv_update.py): the jnp version
            # below is one full-pool scatter PER CHUNK OFFSET
            from composable_kernel_tpu.ops.kv_update import (
                kv_cache_update_paged_chunk,
            )

            pool["k"], pool["v"] = kv_cache_update_paged_chunk(
                pool["k"], pool["v"], k_in.astype(pool["k"].dtype),
                v_in.astype(pool["v"].dtype), table, pos_v, page=page,
                interpret=interpret,
            )
        else:
            # scatter the C chunk rows into their pages; C is small and
            # static, so one vectorized [B]-row scatter per chunk offset (a
            # row may land on a different page than its neighbor — each
            # gets its own table lookup). Inactive slots point at page 0,
            # the null target.
            for i in range(c):
                pg = table[batch_ix, (pos_v + i) // page]
                off = (pos_v + i) % page
                pool["k"] = pool["k"].at[pg, :, off].set(
                    k_in[:, :, i, :].astype(pool["k"].dtype)
                )
                pool["v"] = pool["v"].at[pg, :, off].set(
                    v_in[:, :, i, :].astype(pool["v"].dtype)
                )
        scales = (
            {"k_scale": pool["ks"], "v_scale": pool["vs"]} if is_i8 else {}
        )
        o = paged_flash_decode(
            q, pool["k"], pool["v"], table, lens, causal=True,
            window=cfg.sliding_window, interpret=interpret, **scales,
        )
        o = o.transpose(0, 2, 1, 3).reshape(b * c, nh * hd)
        o = _linear(o, layer["wo"], cfg, interpret, kernels, global_k=cfg.dim)
        x = x + o.reshape(b, c, -1)
        h = rmsnorm(x, layer["ffn_norm"], cfg.norm_eps, kernels, interpret)
        x = x + _ffn_block(h, layer, cfg, interpret=interpret, kernels=kernels)
        new_pools.append(pool)

    x = rmsnorm(x, params["norm"], cfg.norm_eps, kernels, interpret)
    logits = _linear(x.reshape(b * c, -1), params["lm_head"], cfg, interpret, kernels)
    return logits.reshape(b, c, -1), new_pools


def seed_paged_cache(pools, seeds, table, cfg: LlamaConfig, *, page: int,
                     slot_pages, slot: int = 0):
    """Scatter prefill K/V ([1, Hkv, S, hd] per layer) into allocated pages.

    slot_pages: the page ids this sequence owns, in order (host list).
    ``slot`` indexes the per-sequence int8 scale rows when kv_quant=int8
    (scales calibrated from the prefill absmax, as seed_kv_cache does).
    """
    s = seeds[0][0].shape[2]
    new_pools = []
    for pool, (k_seed, v_seed) in zip(pools, seeds):
        pool = dict(pool)
        if "ks" in pool:
            ks = jnp.maximum(
                jnp.max(jnp.abs(k_seed.astype(jnp.float32)), axis=(0, 2, 3))
                / 127.0, 1e-6,
            )
            vs = jnp.maximum(
                jnp.max(jnp.abs(v_seed.astype(jnp.float32)), axis=(0, 2, 3))
                / 127.0, 1e-6,
            )
            pool["ks"] = pool["ks"].at[slot].set(ks)
            pool["vs"] = pool["vs"].at[slot].set(vs)
            k_seed = _quantize_kv(k_seed, pool["ks"][slot : slot + 1])
            v_seed = _quantize_kv(v_seed, pool["vs"][slot : slot + 1])
        for i, pg in enumerate(slot_pages):
            lo = i * page
            if lo >= s:
                break
            n_rows = min(page, s - lo)
            # seeds are [1, Hkv, S, hd]; the slice IS the page layout
            pool["k"] = jax.lax.dynamic_update_slice(
                pool["k"], k_seed[:, :, lo : lo + n_rows].astype(pool["k"].dtype),
                (pg, 0, 0, 0),
            )
            pool["v"] = jax.lax.dynamic_update_slice(
                pool["v"], v_seed[:, :, lo : lo + n_rows].astype(pool["v"].dtype),
                (pg, 0, 0, 0),
            )
        new_pools.append(pool)
    return new_pools
