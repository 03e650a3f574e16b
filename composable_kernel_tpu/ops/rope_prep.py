"""Fused decode-side QKV post-processing: rope + KV quant + q packing.

One pallas launch per layer replacing the decode step's XLA glue chain
between the QKV projection and the attention kernel: rotary embedding on
q and k (rotate-half form), per-(B,Hkv) int8 KV quantization (bit-exact
``models.llama._quantize_kv``), and the head-grouped q packing that
``decode_attention`` otherwise re-does per call with a pad+reshape. At
B=8 the unfused chain is ~10 small XLA fusions per layer (~25 us) whose
launch overhead dwarfs their work; here it is ~240 sub-tile VPU ops in
one kernel.

Outputs land directly in the attention kernel's operand layouts:
  q_packed [B, Hkv*rows_pad, Dp]  (decode_attention q_layout="packed")
  k_new    [B, Hkv, Dp]           (storage dtype; the has_new fold-in row)
  v_new    [B, Hkv, Dp]

CK analog: none line-for-line — this is the serving-runtime glue CK
leaves to its consumers; the fusion stance mirrors its pre-op transfer
operators (thread_group_tensor_slice_transfer with element ops applied
during the copy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.gemm.kernel import _ceil_mult, _interpret_default

__all__ = ["rope_quant_prep"]

_LANES = 128


def _kernel(qkv_ref, cos_ref, sin_ref, *rest,
            n_heads, n_kv_heads, head_dim, rows_pad, has_scale, kv_width):
    if has_scale:
        ks_ref, vs_ref = rest[0], rest[1]
        rest = rest[2:]
    q_ref, kn_ref, vn_ref = rest
    d2 = head_dim // 2
    cos = cos_ref[...].astype(jnp.float32)  # [B, d2]
    sin = sin_ref[...].astype(jnp.float32)
    group = n_heads // n_kv_heads

    def rot(base):
        x1 = qkv_ref[:, base : base + d2].astype(jnp.float32)
        x2 = qkv_ref[:, base + d2 : base + head_dim].astype(jnp.float32)
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        )  # [B, head_dim] f32

    q_ref[...] = jnp.zeros_like(q_ref)
    for h in range(n_heads):
        row = (h // group) * rows_pad + (h % group)
        q_ref[:, row, :head_dim] = rot(h * head_dim).astype(q_ref.dtype)

    def store_kv(out_ref, j, vals, s_ref):
        if has_scale:
            # bit-exact models.llama._quantize_kv: round-half-even on the
            # f32 value / per-(B,Hkv) scale
            s = s_ref[:, j : j + 1]  # [B, 1] f32
            vals = jnp.clip(jnp.round(vals / s), -127, 127)
        out_ref[:, j, :head_dim] = vals.astype(out_ref.dtype)

    k0 = n_heads * head_dim
    v0 = k0 + n_kv_heads * head_dim
    kn_ref[...] = jnp.zeros_like(kn_ref)
    vn_ref[...] = jnp.zeros_like(vn_ref)
    for j in range(n_kv_heads):
        # the unfused path materializes the rope output in the activation
        # dtype before quantizing (k = concat(...).astype(k.dtype) then
        # _quantize_kv) — replicate that rounding for bit parity
        k_rot = rot(k0 + j * head_dim).astype(qkv_ref.dtype).astype(
            jnp.float32
        )
        store_kv(kn_ref, j, k_rot, ks_ref if has_scale else None)
        v = qkv_ref[:, v0 + j * head_dim : v0 + (j + 1) * head_dim].astype(
            jnp.float32
        )
        store_kv(vn_ref, j, v, vs_ref if has_scale else None)


def rope_quant_prep(
    qkv,
    cos,
    sin,
    *,
    n_heads: int,
    n_kv_heads: int,
    head_dim: int,
    rows_pad: int | None = None,
    k_scale=None,
    v_scale=None,
    out_dtype=None,
    interpret: bool | None = None,
):
    """qkv [B, (nh+2*nkv)*hd] -> (q_packed, k_new, v_new), one launch.

    cos/sin: [B, hd/2] f32 (``rope_cos_sin`` at the per-slot positions).
    k_scale/v_scale: [B, Hkv] f32 per-head KV-cache scales (int8 cache);
    None keeps the storage dtype float. rows_pad defaults to the
    attention kernel's 8-sublane floor over group*1 query rows.
    """
    b, width = qkv.shape
    assert width == (n_heads + 2 * n_kv_heads) * head_dim, (
        width, n_heads, n_kv_heads, head_dim
    )
    assert n_heads % n_kv_heads == 0
    group = n_heads // n_kv_heads
    if rows_pad is None:
        rows_pad = _ceil_mult(group, 8)
    dp = _ceil_mult(head_dim, _LANES)
    if interpret is None:
        interpret = _interpret_default()
    if out_dtype is None:
        out_dtype = qkv.dtype
    has_scale = k_scale is not None
    kv_dtype = jnp.int8 if has_scale else out_dtype
    d2 = head_dim // 2
    cos = jnp.asarray(cos, jnp.float32).reshape(b, d2)
    sin = jnp.asarray(sin, jnp.float32).reshape(b, d2)

    full = lambda *shape: pl.BlockSpec(
        shape, lambda *_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    in_specs = [full(b, width), full(b, d2), full(b, d2)]
    inputs = [qkv, cos, sin]
    if has_scale:
        assert v_scale is not None
        assert k_scale.shape == (b, n_kv_heads), k_scale.shape
        in_specs += [full(b, n_kv_heads), full(b, n_kv_heads)]
        inputs += [jnp.asarray(k_scale, jnp.float32),
                   jnp.asarray(v_scale, jnp.float32)]

    out_shape = (
        jax.ShapeDtypeStruct((b, n_kv_heads * rows_pad, dp), out_dtype),
        jax.ShapeDtypeStruct((b, n_kv_heads, dp), kv_dtype),
        jax.ShapeDtypeStruct((b, n_kv_heads, dp), kv_dtype),
    )
    out_specs = (
        full(b, n_kv_heads * rows_pad, dp),
        full(b, n_kv_heads, dp),
        full(b, n_kv_heads, dp),
    )

    return pl.pallas_call(
        functools.partial(
            _kernel, n_heads=n_heads, n_kv_heads=n_kv_heads,
            head_dim=head_dim, rows_pad=rows_pad, has_scale=has_scale,
            kv_width=dp,
        ),
        out_shape=out_shape,
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*inputs)
