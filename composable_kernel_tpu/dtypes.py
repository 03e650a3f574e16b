"""Dtype registry and packed-int4 utilities.

TPU-native analog of CK's data-type layer (reference:
``include/ck/utility/data_type.hpp:10-14`` — half_t/bhalf_t/int4_t/f8_t and
``type_convert`` with RTN rounding). On TPU we use native jnp dtypes for
everything except int4, which is stored *packed two-per-byte in an int8
array* so it can be DMA'd and unpacked inside Pallas kernels with vector
shifts (the analog of CK's ``FastNumericArrayConverter``,
``element/unary_element_wise_operation.hpp:1061-1094``).

Packing layout ("split-K halves"): for a weight matrix W[K, N] quantized to
int4, byte ``P[k, n]`` of the packed array ``P[K//2, N] : int8`` holds

  - low  nibble = W[k, n]
  - high nibble = W[k + K//2, n]

i.e. we pack element ``k`` with element ``k + K/2`` rather than with ``k+1``.
Unpacking is then a concatenate along K — *no interleave* — which lowers to
cheap sublane ops on the VPU, whereas an even/odd interleave would require an
expensive shuffle across sublanes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# dtype registry
# --------------------------------------------------------------------------

#: canonical activation dtypes
F32 = jnp.float32
F16 = jnp.float16
BF16 = jnp.bfloat16
#: quantized storage dtypes
I8 = jnp.int8
U8 = jnp.uint8
I32 = jnp.int32
#: fp8 (e4m3 / e5m2) — CK's f8_t / bf8_t
F8E4M3 = jnp.float8_e4m3fn
F8E5M2 = jnp.float8_e5m2

_SHORT_NAMES = {
    "float32": "f32",
    "float16": "f16",
    "bfloat16": "bf16",
    "int8": "i8",
    "uint8": "u8",
    "int32": "i32",
    "int4": "i4",
    "float8_e4m3fn": "f8",
    "float8_e5m2": "bf8",
}


def short_name(dtype) -> str:
    """Short dtype tag used in instance names (cf. CK instance .cpp naming)."""
    name = jnp.dtype(dtype).name
    return _SHORT_NAMES.get(name, name)


# --------------------------------------------------------------------------
# int4 pack / unpack (host side; kernel-side unpack lives in ops/quant)
# --------------------------------------------------------------------------


def pack_int4(w: jnp.ndarray, axis: int = 0, blocks: int = 1) -> jnp.ndarray:
    """Pack an int4-valued int8 array two-per-byte along ``axis``.

    ``w`` must contain values in [-8, 7]. With ``blocks=1``, element ``k``
    of the axis is packed with element ``k + K/2`` (split-halves layout, see
    module docstring). With ``blocks=B``, the axis is divided into B equal
    row-blocks packed *independently* — the tensor-parallel layout: sharding
    the packed axis over B devices gives each shard a self-contained
    split-halves matrix for its contiguous K range.
    Returns an int8 array whose ``axis`` length is halved.
    """
    w = jnp.asarray(w, jnp.int8)
    k = w.shape[axis]
    if k % (2 * blocks) != 0:
        raise ValueError(f"axis length {k} must divide into {blocks} even blocks")
    if blocks > 1:
        chunks = jnp.split(w, blocks, axis=axis)
        return jnp.concatenate([pack_int4(c, axis) for c in chunks], axis=axis)
    lo = jnp.take(w, jnp.arange(k // 2), axis=axis)
    hi = jnp.take(w, jnp.arange(k // 2, k), axis=axis)
    return ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray, axis: int = 0, blocks: int = 1) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`: int8 packed → int8 values in [-8, 7].

    This is the *reference* unpack; Pallas kernels inline the same two-shift
    sequence on VMEM tiles.
    """
    packed = jnp.asarray(packed, jnp.int8)
    if blocks > 1:
        chunks = jnp.split(packed, blocks, axis=axis)
        return jnp.concatenate([unpack_int4(c, axis) for c in chunks], axis=axis)
    # low nibble: shift left then arithmetic-shift right to sign-extend.
    lo = ((packed << 4).astype(jnp.int8) >> 4).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)  # arithmetic shift on int8
    return jnp.concatenate([lo, hi], axis=axis)


def unpack_int4_np(packed: np.ndarray, axis: int = 0, blocks: int = 1) -> np.ndarray:
    """NumPy twin of :func:`unpack_int4` for host-side checks."""
    packed = packed.astype(np.int8)
    if blocks > 1:
        chunks = np.split(packed, blocks, axis=axis)
        return np.concatenate([unpack_int4_np(c, axis) for c in chunks], axis=axis)
    lo = ((packed << 4).astype(np.int8) >> 4).astype(np.int8)
    hi = (packed >> 4).astype(np.int8)
    return np.concatenate([lo, hi], axis=axis)


# --------------------------------------------------------------------------
# W4A8 pack: AND-only nibble extraction for the int8-MXU dot path
# --------------------------------------------------------------------------
#
# Same split-halves/segments geometry as pack_int4, different bit encoding,
# chosen so the Pallas kernel extracts both nibbles with ONE int8 bitwise
# AND each — no shifts (Mosaic has no i8 vector shifts), no i32 widening,
# no float converts on the weight stream:
#
#   byte = ((W[k + K/2] & 0xF) << 4) | ((W[k] + 8) & 0xF)
#
#   packed & 0xF0  ==  16 * W[k + K/2]   (high nibble SIGNED: the nibble's
#                                         sign bit lands on the byte's sign
#                                         bit, so the int8 value is exactly
#                                         16*w_hi; the x16 folds into the
#                                         group scale)
#   packed & 0x0F  ==  W[k] + 8          (low nibble OFFSET-BINARY in
#                                         [0, 15]; the +8 folds into a
#                                         per-group rowsum correction on
#                                         the activation tile)
#
# This is CK's FastNumericArrayConverter offset-binary trick
# (element/unary_element_wise_operation.hpp:1061-1094) retargeted at the
# int8 MXU instead of fp16 bit-twiddling.


def pack_int4_w4a8(w: jnp.ndarray, axis: int = 0, blocks: int = 1) -> jnp.ndarray:
    """Pack int4 values ([-8, 7]) for the W4A8 kernel (AND-only unpack).

    Split-halves layout as :func:`pack_int4`; high nibble stores
    ``W[k + K/2]`` signed, low nibble stores ``W[k] + 8`` offset-binary.
    """
    w = jnp.asarray(w, jnp.int8)
    k = w.shape[axis]
    if k % (2 * blocks) != 0:
        raise ValueError(f"axis length {k} must divide into {blocks} even blocks")
    if blocks > 1:
        chunks = jnp.split(w, blocks, axis=axis)
        return jnp.concatenate([pack_int4_w4a8(c, axis) for c in chunks], axis=axis)
    lo = jnp.take(w, jnp.arange(k // 2), axis=axis)
    hi = jnp.take(w, jnp.arange(k // 2, k), axis=axis)
    return (((lo + 8) & 0x0F) | (hi << 4)).astype(jnp.int8)


def unpack_int4_w4a8(packed: jnp.ndarray, axis: int = 0, blocks: int = 1) -> jnp.ndarray:
    """Inverse of :func:`pack_int4_w4a8` → int8 values in [-8, 7]."""
    packed = jnp.asarray(packed, jnp.int8)
    if blocks > 1:
        chunks = jnp.split(packed, blocks, axis=axis)
        return jnp.concatenate(
            [unpack_int4_w4a8(c, axis) for c in chunks], axis=axis
        )
    lo = ((packed & 0x0F) - 8).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)  # arithmetic shift sign-extends
    return jnp.concatenate([lo, hi], axis=axis)


# --------------------------------------------------------------------------
# rounding-mode conversions (CK type_convert parity:
# element/unary_element_wise_operation.hpp:236-287 — RTN + stochastic)
# --------------------------------------------------------------------------


def round_nearest_int(x: jnp.ndarray, dtype=jnp.int8) -> jnp.ndarray:
    """Round-to-nearest-even float→int conversion with saturation."""
    info = jnp.iinfo(dtype)
    return jnp.clip(jnp.round(x), info.min, info.max).astype(dtype)


def round_stochastic_int(x: jnp.ndarray, key, dtype=jnp.int8) -> jnp.ndarray:
    """Stochastic-rounding float→int conversion with saturation.

    ``floor(x + u)`` with u ~ U[0, 1): E[result] == x exactly, so quant
    noise is unbiased and averages out across accumulation steps — the
    low-precision-training property CK's SR type_convert variants provide
    (element_wise_operation.hpp f8 SR converters). RNE instead biases every
    value toward its nearer neighbor, which compounds in optimizer state.
    """
    import jax

    info = jnp.iinfo(dtype)
    u = jax.random.uniform(key, x.shape, jnp.float32)
    return jnp.clip(
        jnp.floor(x.astype(jnp.float32) + u), info.min, info.max
    ).astype(dtype)


def convert_stochastic(x: jnp.ndarray, key, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Stochastic-rounding f32→bf16 conversion (CK SR type_convert analog).

    Adds uniform random bits in the 16 truncated mantissa positions, then
    truncates: each f32 rounds up with probability equal to its fractional
    distance between the two neighboring bf16 values — unbiased, unlike
    RNE. Values already representable in bf16 pass through exactly.
    """
    import jax

    assert jnp.dtype(dtype) == jnp.bfloat16, "SR float convert targets bf16"
    xf = jnp.asarray(x, jnp.float32)
    bits = jax.lax.bitcast_convert_type(xf, jnp.uint32)
    noise = jax.random.bits(key, xf.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    # NaN/inf must not round across the exponent boundary
    finite = jnp.isfinite(xf)
    bumped = jnp.where(finite, bits + noise, bits)
    truncated = bumped & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(truncated, jnp.float32).astype(dtype)


def min_tile(dtype) -> tuple[int, int]:
    """Minimum TPU (sublane, lane) tile for ``dtype`` (pallas_guide tiling table)."""
    itemsize = jnp.dtype(dtype).itemsize
    return {4: (8, 128), 2: (16, 128), 1: (32, 128)}[itemsize]
