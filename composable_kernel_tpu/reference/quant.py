"""Reference quantized GEMMs and quantizers.

Mirrors CK's ``reference_fpAintB_gemm.hpp:25-90`` — the weight-only dequant
GEMM ``c = a @ (convert(b) * scale)`` — extended with group-wise scales
(CK expresses g-wise via B-scale stride tricks in the multi-ABD client,
client_example/30_gemm_bf16Aint8B/gemm_xdl_bf16_i8.cpp:28-56), and the int8
activation-quant GEMM with requant epilogue
(example/14_gemm_quantization, quantization_operation.hpp:25-251).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

from composable_kernel_tpu import dtypes
from composable_kernel_tpu.ops import epilogues as ep


def ref_dequant_gemm(
    a,
    b_q,
    scales,
    ds=(),
    c_op=ep.passthrough,
    group_size: int | None = None,
    packed_int4: bool = False,
    pack_blocks: int = 1,
    out_dtype=None,
):
    """C = c_op(A @ dequant(B), *Ds).

    a:      [M, K] float (fp16/bf16/f32)
    b_q:    [K, N] int8  — or [K//2, N] packed int4 if ``packed_int4``
    scales: [N] per-channel, or [K//group_size, N] group-wise
    """
    if packed_int4:
        b_q = dtypes.unpack_int4(b_q, axis=0, blocks=pack_blocks)
    k = b_q.shape[0]
    b = b_q.astype(jnp.float32)
    scales = jnp.asarray(scales, jnp.float32)
    # CK's reference converts B to ADataType before the multiply
    # (reference_fpAintB_gemm.hpp:25-90: c = a * (convert(b) * scale) with
    # the dequant computed in ADataType). We model the same matrix-unit
    # semantics: for 16-bit activations the dequantized weight is rounded to
    # the compute dtype before the dot, exactly as the kernel feeds the MXU.
    compute_dtype = a.dtype if jnp.dtype(a.dtype).itemsize == 2 else jnp.float32
    if group_size is None:
        # kernel applies per-channel scale post-accumulation in f32; the
        # integer B is exactly representable in the compute dtype.
        b = b.astype(compute_dtype).astype(jnp.float32) * scales[None, :]
    else:
        n_groups = k // group_size
        b = b.reshape(n_groups, group_size, -1) * scales[:, None, :]
        b = b.reshape(k, -1).astype(compute_dtype).astype(jnp.float32)
    acc = jnp.matmul(a.astype(jnp.float32), b, preferred_element_type=jnp.float32, precision=_HI)
    out = c_op(acc, *[jnp.asarray(d, jnp.float32) for d in ds])
    return out.astype(out_dtype or a.dtype)


def ref_int8_gemm_requant(a_q, b_q, requant_op, ds=()):
    """int8 x int8 -> int32 acc -> requant epilogue -> int8.

    ``requant_op`` is one of the ``*_mul_clamp`` factories from
    ``ops.epilogues`` (CK quantization_operation.hpp parity).
    """
    acc = jnp.matmul(
        a_q.astype(jnp.int32), b_q.astype(jnp.int32), preferred_element_type=jnp.int32,
        precision=_HI,
    )
    out = requant_op(acc, *[jnp.asarray(d) for d in ds])
    return out.astype(jnp.int8)


# ------------------------------------------------------------ quantizers ---


def ref_quantize_per_channel(w, bits: int = 8):
    """Symmetric per-output-channel (per-N-column) quantization of W[K, N].

    Returns (w_q int8 in [-2^(b-1), 2^(b-1)-1], scales[N] f32).
    """
    qmax = 2 ** (bits - 1) - 1
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    s = jnp.maximum(absmax / qmax, 1e-8)
    w_q = jnp.clip(jnp.round(w.astype(jnp.float32) / s[None, :]), -qmax - 1, qmax)
    return w_q.astype(jnp.int8), s


def ref_quantize_group(w, group_size: int = 128, bits: int = 4):
    """Symmetric group-wise quantization of W[K, N] along K.

    Returns (w_q int8 values in int4/int8 range, scales[K//g, N] f32).
    """
    k, n = w.shape
    assert k % group_size == 0
    qmax = 2 ** (bits - 1) - 1
    wg = w.astype(jnp.float32).reshape(k // group_size, group_size, n)
    absmax = jnp.max(jnp.abs(wg), axis=1)
    s = jnp.maximum(absmax / qmax, 1e-8)
    w_q = jnp.clip(jnp.round(wg / s[:, None, :]), -qmax - 1, qmax)
    return w_q.reshape(k, n).astype(jnp.int8), s


def ref_quantize_act_token(x, bits: int = 8):
    """Per-token (per-row) symmetric int8 activation quantization.

    The dynamic-quant refinement of CK's per-tensor activation quant
    (``example/14_gemm_quantization``): one scale per output row, computed
    from the row's absmax. Returns (x_q int8 [M, K], scales f32 [M, 1]).
    """
    qmax = 2 ** (bits - 1) - 1
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    # explicit reciprocal-multiply: bit-stable across jit boundaries (XLA
    # rewrites /const to this form under jit; see ops.quant.w4a8)
    s = jnp.maximum(absmax * jnp.float32(1.0 / qmax), 1e-8)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -qmax, qmax)
    return x_q.astype(jnp.int8), s


def ref_w4a8_gemm(
    a_q,
    a_scales,
    w_q,
    scales,
    group_size: int,
    ds=(),
    c_op=ep.passthrough,
    out_dtype=jnp.bfloat16,
):
    """int8-activation x int4-weight GEMM reference (the W4A8 path).

    Math the kernel (``ops/quant/w4a8.py``) implements on the int8 MXU:

        C[m, n] = a_s[m] * sum_g s[g, n] * (A_q[m, g*gs:(g+1)*gs]
                                            @ W_q[g*gs:(g+1)*gs, n])

    with each per-group dot exact in int32 and the scale-accumulate in f32.
    CK analog: reference_fpAintB_gemm.hpp:25-90 with the activation side of
    quantization_operation.hpp added.

    a_q:      [M, K] int8 per-token-quantized activations
    a_scales: [M] or [M, 1] f32
    w_q:      [K, N] int8 holding int4 values in [-8, 7] (UNPACKED)
    scales:   [K // group_size, N] f32
    """
    k, n = w_q.shape
    m = a_q.shape[0]
    g = k // group_size
    aq = a_q.astype(jnp.int32).reshape(m, g, group_size)
    wq = w_q.astype(jnp.int32).reshape(g, group_size, n)
    dots = jnp.einsum(
        "mgk,gkn->gmn", aq, wq, preferred_element_type=jnp.int32, precision=_HI
    ).astype(jnp.float32)
    acc = jnp.einsum(
        "gmn,gn->mn", dots, jnp.asarray(scales, jnp.float32), precision=_HI
    )
    acc = acc * jnp.asarray(a_scales, jnp.float32).reshape(-1, 1)
    out = c_op(acc, *[jnp.asarray(d, jnp.float32) for d in ds])
    return out.astype(out_dtype)


def ref_quantize_activation_per_tensor(x, bits: int = 8):
    """Symmetric per-tensor activation quant: returns (x_q int8, scale f32)."""
    qmax = 2 ** (bits - 1) - 1
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    s = jnp.maximum(absmax / qmax, 1e-8)
    x_q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -qmax - 1, qmax)
    return x_q.astype(jnp.int8), s
