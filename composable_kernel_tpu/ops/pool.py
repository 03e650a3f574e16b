"""Pooling op family (avg/max fwd + bwd, Nd, NHWC).

CK surface: ``device_pool_fwd.hpp`` (``device_pool2d_fwd_nhwc_nhwc.hpp``,
``device_pool3d_fwd_ndhwc_ndhwc.hpp``), ``device_avgpool_bwd.hpp``,
``device_max_pool_bwd.hpp`` (bwd via saved flat indices).

TPU design: pooling is a windowed reduction — ``lax.reduce_window`` is the
native XLA primitive and lowers to the optimal VPU program; max-pool
backward scatters through the fwd argmax indices exactly like CK's
device_max_pool_bwd (which replays indices saved by the fwd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["avg_pool", "max_pool", "avg_pool_bwd", "max_pool_bwd"]


def _window(ndim, window, strides):
    strides = strides or window
    full_w = (1, *window, 1)
    full_s = (1, *strides, 1)
    return full_w, full_s


def avg_pool(x, window, strides=None, *, padding="VALID", count_include_pad=True,
             out_dtype=None):
    """Nd average pool over NHWC (CK device_avgpoolNd_fwd)."""
    ndim = x.ndim - 2
    full_w, full_s = _window(ndim, window, strides)
    xf = x.astype(jnp.float32)
    summed = jax.lax.reduce_window(xf, 0.0, jax.lax.add, full_w, full_s, padding)
    if count_include_pad or padding == "VALID":
        denom = float(np.prod(window))
        y = summed / denom
    else:
        ones = jnp.ones_like(xf)
        counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, full_w, full_s, padding)
        y = summed / counts
    return y.astype(out_dtype or x.dtype)


def max_pool(x, window, strides=None, *, padding="VALID", return_indices=False,
             out_dtype=None):
    """Nd max pool; optionally returns flat argmax indices (CK maxpool fwd
    emits indices consumed by device_max_pool_bwd)."""
    ndim = x.ndim - 2
    full_w, full_s = _window(ndim, window, strides)
    xf = x.astype(jnp.float32)
    y = jax.lax.reduce_window(
        xf, -jnp.inf, jax.lax.max, full_w, full_s, padding
    )
    y = y.astype(out_dtype or x.dtype)
    if not return_indices:
        return y
    # argmax via a paired (value, flat-index) max reduction
    flat_idx = jnp.arange(xf.size, dtype=jnp.int32).reshape(xf.shape)

    def select(a, b):
        av, ai = a
        bv, bi = b
        take_a = av >= bv
        return jnp.where(take_a, av, bv), jnp.where(take_a, ai, bi)

    _, idx = jax.lax.reduce_window(
        (xf, flat_idx),
        (-jnp.inf, jnp.int32(0)),
        select,
        full_w,
        full_s,
        padding,
    )
    return y, idx


def avg_pool_bwd(dy, input_shape, window, strides=None, *, padding="VALID"):
    """dx for average pooling (CK device_avgpool_bwd): spread dy/|w| back."""
    ndim = len(input_shape) - 2
    full_w, full_s = _window(ndim, window, strides)
    denom = float(np.prod(window))

    def f(x):
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, full_w, full_s, padding)
        return s / denom

    zero = jnp.zeros(input_shape, jnp.float32)
    _, vjp = jax.vjp(f, zero)
    (dx,) = vjp(dy.astype(jnp.float32))
    return dx.astype(dy.dtype)


def max_pool_bwd(dy, indices, input_shape):
    """dx for max pooling via saved flat indices (CK device_max_pool_bwd:
    atomically scatter dy through the fwd argmax)."""
    flat = jnp.zeros(int(np.prod(input_shape)), jnp.float32)
    flat = flat.at[indices.reshape(-1)].add(dy.astype(jnp.float32).reshape(-1))
    return flat.reshape(input_shape).astype(dy.dtype)
