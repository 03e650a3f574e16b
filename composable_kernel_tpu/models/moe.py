"""Mixture-of-Experts block on the ragged grouped GEMM.

CK connection: grouped GEMM with device-side arguments is CK's MoE
building block (``device_grouped_gemm_fixed_nk.hpp`` SetDeviceKernelArgs,
``device_grouped_gemm_tile_loop.hpp`` — SURVEY.md §2.3 "fixed-NK +
tile-loop ≈ continuous-batching building block"). Here the token->expert
dispatch sorts tokens by expert and runs ONE ragged grouped GEMM per
projection (``ops.gemm.ragged``), the TPU-native equivalent of the
persistent tile-loop kernel.

Expert parallelism (absent in the single-GPU reference): experts shard
over an 'ep' mesh axis inside shard_map — each device computes its local
experts' contribution for ALL tokens (gating weights for remote experts
are zero locally) and a single psum combines. Top-k routing with
softmax-renormalized gate weights (Mixtral convention).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from composable_kernel_tpu.ops.gemm.api import grouped_gemm
from composable_kernel_tpu.ops.gemm.config import GemmConfig

__all__ = [
    "MoEConfig", "init_moe_weights", "quantize_moe_weights",
    "dequantize_moe_weights", "moe_block", "moe_block_ragged",
    "moe_block_ep",
]


@dataclass(frozen=True)
class MoEConfig:
    dim: int = 256
    ffn_dim: int = 512
    n_experts: int = 8
    top_k: int = 2
    dtype: str = "bfloat16"

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def init_moe_weights(cfg: MoEConfig, key):
    kr, kg, ku, kd = jax.random.split(key, 4)
    std = cfg.dim ** -0.5
    mk = lambda k, shape: (jax.random.normal(k, shape, jnp.float32) * std).astype(
        cfg.jdtype
    )
    return {
        "router": mk(kr, (cfg.dim, cfg.n_experts)),
        "w_gate": mk(kg, (cfg.n_experts, cfg.dim, cfg.ffn_dim)),
        "w_up": mk(ku, (cfg.n_experts, cfg.dim, cfg.ffn_dim)),
        "w_down": mk(kd, (cfg.n_experts, cfg.ffn_dim, cfg.dim)),
    }


def quantize_moe_weights(weights, bits: int = 8, *, mode: str = "w8a16",
                         group_size: int = 128):
    """Per-expert quantization of the expert stacks.

    mode="w8a16" (default): per-channel int8 — each w_* leaf [E, K, N]
    becomes {"q": int8 [E, K, N], "s": f32 [E, N]}; near-lossless for
    experts (model-level ppl table in docs/performance.md).
    mode="w4a8": group-wise int4 in the AND-only pack
    (dtypes.pack_int4_w4a8) for the int8-MXU grouped GEMM — leaves become
    {"q": int8 [E, K//2, N], "s": f32 [E, K//g, N], "gs": g}. The router
    stays full precision (tiny, decides routing).
    """
    from composable_kernel_tpu import dtypes
    from composable_kernel_tpu.reference.quant import (
        ref_quantize_group,
        ref_quantize_per_channel,
    )

    out = {"router": weights["router"]}
    for name in ("w_gate", "w_up", "w_down"):
        w = weights[name]
        if mode == "w4a8":
            qs = [
                ref_quantize_group(w[i], group_size=group_size, bits=4)
                for i in range(w.shape[0])
            ]
            out[name] = {
                "q": jnp.stack([dtypes.pack_int4_w4a8(q) for q, _ in qs]),
                "s": jnp.stack([sc for _, sc in qs]),
                "gs": group_size,
            }
        else:
            qs = [
                ref_quantize_per_channel(w[i], bits=bits)
                for i in range(w.shape[0])
            ]
            out[name] = {
                "q": jnp.stack([q for q, _ in qs]),
                "s": jnp.stack([sc for _, sc in qs]),
            }
    return out


def dequantize_moe_weights(weights):
    """Inverse of quantize_moe_weights (f32 stacks) — the reference-path
    companion: the dense einsum ``moe_block`` needs full-precision expert
    stacks, so quantized models dequantize here before comparing."""
    from composable_kernel_tpu import dtypes

    out = {"router": weights["router"]}
    for name in ("w_gate", "w_up", "w_down"):
        w = weights[name]
        if not isinstance(w, dict):
            out[name] = w
            continue
        if "gs" in w:
            g = w["gs"]
            ints = jnp.stack(
                [dtypes.unpack_int4_w4a8(w["q"][e]) for e in range(w["q"].shape[0])]
            ).astype(jnp.float32)
            out[name] = ints * jnp.repeat(w["s"], g, axis=1)
        else:
            out[name] = w["q"].astype(jnp.float32) * w["s"][:, None, :]
    return out


def _stack_size(w):
    """Expert count of a stack leaf (raw [E, K, N] array or quantized
    {"q", "s"[, "gs"]} dict)."""
    return (w["q"] if isinstance(w, dict) else w).shape[0]


def _route(x2, router, top_k):
    """Returns (weights [T, k], experts [T, k]) with renormalized softmax."""
    logits = jnp.matmul(x2.astype(jnp.float32), router.astype(jnp.float32))
    w, idx = jax.lax.top_k(logits, top_k)
    w = jax.nn.softmax(w, axis=-1)
    return w, idx


def moe_block(x, weights, cfg: MoEConfig, *, ep_axis=None):
    """Dense-dispatch MoE: y[T, D] = sum_k w_k * expert_{e_k}(x).

    Einsum formulation — every token visits its top-k experts via one-hot
    combine arrays. O(T * E / top_k) overhead vs ragged dispatch, but
    shard_map/psum-friendly: under ``ep_axis`` each device holds its
    expert shard of the (E, ...) weights and contributes partial sums.
    """
    t, d = x.shape
    n_local = _stack_size(weights["w_gate"])
    w, idx = _route(x, weights["router"], cfg.top_k)
    if ep_axis is not None:
        # global expert id -> local slot (or out of range = contribute 0)
        offset = jax.lax.axis_index(ep_axis) * n_local
        idx = idx - offset
        valid = (idx >= 0) & (idx < n_local)
        w = jnp.where(valid, w, 0.0)
        idx = jnp.clip(idx, 0, n_local - 1)
    # combine [T, k, E_local]
    onehot = jax.nn.one_hot(idx, n_local, dtype=jnp.float32) * w[..., None]
    combine = onehot.sum(axis=1)  # [T, E_local]
    xf = x.astype(jnp.float32)
    g = jnp.einsum("td,edf->tef", xf, weights["w_gate"].astype(jnp.float32))
    u = jnp.einsum("td,edf->tef", xf, weights["w_up"].astype(jnp.float32))
    h = jax.nn.silu(g) * u
    y = jnp.einsum("tef,efd->ted", h, weights["w_down"].astype(jnp.float32))
    out = jnp.einsum("ted,te->td", y, combine)
    if ep_axis is not None:
        out = jax.lax.psum(out, ep_axis)
    return out.astype(x.dtype)


def _run_grouped(counts, a_in, wstack, cfg_g, interpret):
    """One grouped GEMM over per-expert row blocks, dispatched on the
    expert-stack quantization: W4A8 packed-int4 ({"q","s","gs"}, int8-MXU
    path), W8A16 per-channel int8 ({"q","s"}), or full precision."""
    if isinstance(wstack, dict) and "gs" in wstack:
        from composable_kernel_tpu.ops.gemm.ragged import ragged_w4a8_gemm
        from composable_kernel_tpu.ops.quant import quantize_act_token

        a_q, a_s = quantize_act_token(a_in)
        return ragged_w4a8_gemm(
            counts, a_q, a_s, wstack["q"], wstack["s"],
            group_size=wstack["gs"], out_dtype=jnp.float32,
            config=cfg_g, interpret=interpret,
        )
    if isinstance(wstack, dict):
        return grouped_gemm(
            counts, a_in, wstack["q"], scales=wstack["s"],
            out_dtype=jnp.float32, config=cfg_g, interpret=interpret,
        )
    return grouped_gemm(
        counts, a_in, wstack, out_dtype=jnp.float32, config=cfg_g,
        interpret=interpret,
    )


def moe_block_ragged(x, weights, cfg: MoEConfig, *, block_m: int = 16,
                     interpret=None):
    """Sorted-dispatch MoE on the ragged grouped GEMM (single device).

    Tokens sort by expert; each of gate/up/down runs as ONE ragged grouped
    GEMM over per-expert row blocks (CK tile-loop analog). Group sizes are
    the raw per-expert counts — no padding, per the arbitrary-size fixed-NK
    contract of ops/gemm/ragged.py (device_grouped_gemm_fixed_nk.hpp:56).
    """
    t, d = x.shape
    e = cfg.n_experts
    w, idx = _route(x, weights["router"], cfg.top_k)
    # flatten (token, k) pairs -> rows, sorted by expert (tightly packed)
    flat_expert = idx.reshape(-1)  # [T*k]
    flat_w = w.reshape(-1)
    flat_tok = jnp.repeat(jnp.arange(t), cfg.top_k)
    order = jnp.argsort(flat_expert)
    flat_tok = flat_tok[order]
    flat_w = flat_w[order]
    counts = jnp.bincount(flat_expert, length=e)
    a = x[flat_tok]

    cfg_g = GemmConfig(block_m=block_m, block_n=512, block_k=512)

    def run(wstack, a_in):
        return _run_grouped(counts, a_in, wstack, cfg_g, interpret)

    g = run(weights["w_gate"], a)
    u = run(weights["w_up"], a)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    y = run(weights["w_down"], h)
    # weighted combine back to token order
    contrib = y * flat_w[:, None]
    out = jnp.zeros((t, d), jnp.float32).at[flat_tok].add(contrib)
    return out.astype(x.dtype)


def moe_block_ep(x, weights, cfg: MoEConfig, *, ep_axis, capacity=None,
                 block_m: int = 16, interpret=None):
    """Token-sharded expert parallelism with capacity-bucketed all-to-all.

    The real EP dispatch (replacing the replicated-token psum of
    ``moe_block(ep_axis=...)``): each device holds ``T_local`` tokens and
    ``E/ep`` experts. (token, k) pairs route to the device owning their
    expert through one ``all_to_all`` of a ``[ep, capacity, D]`` send
    buffer, compute locally via the ragged grouped GEMM (sorted by local
    expert — CK grouped-GEMM-fixed-NK with device-side sizes), and return
    through a second ``all_to_all``; gate weighting happens on the source
    device. Traffic scales with ``capacity`` (defaults to the no-drop bound
    ``T_local * top_k``), NOT with device count.

    Call inside ``shard_map`` with x row-sharded and expert weights
    sharded on dim 0 over ``ep_axis`` (router replicated).
    """
    t, d = x.shape
    n_local = _stack_size(weights["w_gate"])
    ep = jax.lax.psum(1, ep_axis)
    w, idx = _route(x, weights["router"], cfg.top_k)
    p = t * cfg.top_k
    flat_e = idx.reshape(-1)
    flat_w = w.reshape(-1)
    flat_tok = jnp.repeat(jnp.arange(t), cfg.top_k)
    td = flat_e // n_local  # target device per pair
    cap = capacity or p  # default: no token ever drops

    # rank of each pair within its (source -> target) bucket
    onehot_td = jax.nn.one_hot(td, ep, dtype=jnp.int32)
    pos = jnp.take_along_axis(
        jnp.cumsum(onehot_td, axis=0) - 1, td[:, None], axis=1
    )[:, 0]
    keep = pos < cap
    slot = jnp.where(keep, pos, cap)  # cap = out-of-range -> dropped scatter

    send_x = jnp.zeros((ep, cap, d), x.dtype).at[td, slot].set(
        x[flat_tok], mode="drop"
    )
    send_e = jnp.full((ep, cap), n_local, jnp.int32).at[td, slot].set(
        flat_e % n_local, mode="drop"
    )  # n_local = "empty slot" sentinel (parks after real experts when sorted)

    a2a = lambda v: jax.lax.all_to_all(
        v, ep_axis, split_axis=0, concat_axis=0, tiled=True
    )
    recv_x = a2a(send_x)
    recv_e = a2a(send_e)

    rows = recv_x.reshape(ep * cap, d)
    e_rows = recv_e.reshape(ep * cap)
    order = jnp.argsort(e_rows)  # empty slots (id n_local) sort last
    a = rows[order]
    counts = jnp.bincount(e_rows, length=n_local + 1)[:n_local]

    cfg_g = GemmConfig(block_m=block_m, block_n=512, block_k=512)

    def run(wstack, a_in):
        return _run_grouped(counts, a_in, wstack, cfg_g, interpret)

    g = run(weights["w_gate"], a)
    u = run(weights["w_up"], a)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    y = run(weights["w_down"], h).astype(x.dtype)
    # unsort back to slot order, return to sources
    y_slots = jnp.zeros_like(y).at[order].set(y).reshape(ep, cap, d)
    back = a2a(y_slots)

    # weighted combine on the source device (dropped pairs contribute 0)
    gathered = back[td, jnp.minimum(slot, cap - 1)]
    wgt = jnp.where(keep, flat_w, 0.0)
    out = jnp.zeros((t, d), jnp.float32).at[flat_tok].add(
        gathered.astype(jnp.float32) * wgt[:, None]
    )
    return out.astype(x.dtype)
