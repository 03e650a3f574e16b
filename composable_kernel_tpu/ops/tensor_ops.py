"""Elementwise / permute / scatter / tensor-rearrange op families.

CK surface covered:

  - ``device_elementwise.hpp`` / ``device_elementwise_scale.hpp`` /
    ``device_elementwise_dynamic_vector_dims_impl.hpp`` -> :func:`elementwise`
  - ``device_permute.hpp`` / ``device_permute_impl.hpp`` -> :func:`permute`
  - ``device_put_element.hpp`` -> :func:`put_element`
  - ``conv_tensor_rearrange_op.hpp`` (im2col / col2im,
    ``device_image_to_column_impl.hpp`` / ``device_column_to_image_impl.hpp``)
    -> :func:`image_to_column` / :func:`column_to_image`

Design stance: these are data-movement ops. On TPU, XLA's copy/transpose
engine and fusion produce optimal layouts-change programs; a handwritten
Pallas kernel can only match it. The value CK adds — a uniform type-erased
op surface with elementwise functor slots — is preserved as the API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "elementwise",
    "permute",
    "put_element",
    "image_to_column",
    "column_to_image",
]


def elementwise(op, *xs, out_dtype=None):
    """y = op(*xs) with broadcasting — CK DeviceElementwise for arbitrary
    arity (unary/binary/ternary functors from ops.epilogues)."""
    out = op(*[x.astype(jnp.float32) for x in xs])
    return out.astype(out_dtype or xs[0].dtype)


def permute(x, perm, *, op=None, out_dtype=None):
    """y = op(transpose(x, perm)) — CK DevicePermute (+ fused elementwise)."""
    y = jnp.transpose(x, perm)
    if op is not None:
        y = op(y.astype(jnp.float32))
    return y.astype(out_dtype or x.dtype)


def put_element(dst, indices, values, *, mode: str = "set"):
    """Scatter values into dst at flat ``indices`` (CK DevicePutElement).

    mode: "set" | "add" | "max" (CK InMemoryDataOperationEnum Set/AtomicAdd/
    AtomicMax).
    """
    flat = dst.reshape(-1)
    if mode == "set":
        flat = flat.at[indices].set(values.astype(dst.dtype))
    elif mode == "add":
        flat = flat.at[indices].add(values.astype(dst.dtype))
    elif mode == "max":
        flat = flat.at[indices].max(values.astype(dst.dtype))
    else:
        raise ValueError(mode)
    return flat.reshape(dst.shape)


def _conv_geometry(spatial, filt, strides, dilations, pads_lo, pads_hi):
    out = []
    for s, f, st, di, pl_, ph in zip(spatial, filt, strides, dilations, pads_lo, pads_hi):
        eff = (f - 1) * di + 1
        out.append((s + pl_ + ph - eff) // st + 1)
    return out


def image_to_column(
    x, filter_shape, strides=None, dilations=None, pads=None
):
    """NHWC image -> [N * prod(out_spatial), prod(filter) * C] patch matrix.

    CK conv_tensor_rearrange (im2col) for 1d/2d/3d: x is [N, *spatial, C].
    This *is* the explicit-GEMM conv route; the implicit-GEMM conv kernel in
    ops/conv.py never materializes this matrix.
    """
    ndim = x.ndim - 2
    spatial = x.shape[1:-1]
    strides = strides or (1,) * ndim
    dilations = dilations or (1,) * ndim
    pads = pads or ((0, 0),) * ndim
    n, c = x.shape[0], x.shape[-1]
    x_p = jnp.pad(x, ((0, 0), *pads, (0, 0)))
    out_sp = _conv_geometry(
        spatial, filter_shape, strides, dilations,
        [p[0] for p in pads], [p[1] for p in pads],
    )
    # gather filter offsets via dynamic slicing per filter tap (static loop)
    cols = []
    for tap in np.ndindex(*filter_shape):
        idx = tuple(
            slice(t * d, t * d + (o - 1) * s + 1, s)
            for t, d, o, s in zip(tap, dilations, out_sp, strides)
        )
        cols.append(x_p[(slice(None), *idx, slice(None))])
    # [taps, N, *out_sp, C] -> [N, *out_sp, taps, C] -> flatten
    stacked = jnp.stack(cols, axis=-2)
    return stacked.reshape(n * int(np.prod(out_sp)), int(np.prod(filter_shape)) * c)


def column_to_image(
    cols, image_shape, filter_shape, strides=None, dilations=None, pads=None
):
    """Inverse of :func:`image_to_column` with overlap-add (CK col2im)."""
    ndim = len(image_shape) - 2
    spatial = image_shape[1:-1]
    strides = strides or (1,) * ndim
    dilations = dilations or (1,) * ndim
    pads = pads or ((0, 0),) * ndim
    n, c = image_shape[0], image_shape[-1]
    padded_sp = [
        s + p[0] + p[1] for s, p in zip(spatial, pads)
    ]
    out_sp = _conv_geometry(
        spatial, filter_shape, strides, dilations,
        [p[0] for p in pads], [p[1] for p in pads],
    )
    n_taps = int(np.prod(filter_shape))
    cols = cols.reshape(n, *out_sp, n_taps, c)
    img = jnp.zeros((n, *padded_sp, c), cols.dtype)
    for t_i, tap in enumerate(np.ndindex(*filter_shape)):
        idx = tuple(
            slice(t * d, t * d + (o - 1) * s + 1, s)
            for t, d, o, s in zip(tap, dilations, out_sp, strides)
        )
        img = img.at[(slice(None), *idx, slice(None))].add(
            cols[(slice(None), *[slice(None)] * ndim, t_i, slice(None))]
        )
    unpad = tuple(slice(p[0], p[0] + s) for p, s in zip(pads, spatial))
    return img[(slice(None), *unpad, slice(None))]
