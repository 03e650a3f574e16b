"""Reference grouped convolution forward + pooling.

Mirrors CK's ``reference_conv_fwd.hpp`` (grouped conv, 1d/2d/3d, NHWGC-style
layouts) and the pooling device ops (device_pool_fwd.hpp). TPU-native layout
is channels-last NHWC / NDHWC with groups folded into the channel dim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ref_conv_fwd(
    x,
    w,
    stride=None,
    padding=None,
    dilation=None,
    groups: int = 1,
    out_dtype=None,
):
    """Grouped conv forward, channels-last.

    x: [N, *spatial, C_in], w: [*filter_spatial, C_in // groups, C_out].
    Supports 1/2/3 spatial dims (CK conv 1d/2d/3d parity).
    """
    nd = x.ndim - 2
    stride = stride or (1,) * nd
    padding = padding or (0,) * nd
    dilation = dilation or (1,) * nd
    pad = [(p, p) for p in padding]
    spatial = "DHW"[-nd:]
    lhs_spec = "N" + spatial + "C"
    rhs_spec = spatial + "IO"
    out_spec = lhs_spec
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=(lhs_spec, rhs_spec, out_spec),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype or x.dtype)


def ref_pool(x, window, stride=None, padding=None, mode: str = "max"):
    """Max/avg pooling over channels-last input (device_pool2d/3d_fwd)."""
    nd = x.ndim - 2
    stride = stride or window
    padding = padding or (0,) * nd
    dims = (1,) + tuple(window) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),)
    xf = x.astype(jnp.float32)
    if mode == "max":
        out = jax.lax.reduce_window(xf, -jnp.inf, jax.lax.max, dims, strides, pads)
    elif mode == "avg":
        s = jax.lax.reduce_window(xf, 0.0, jax.lax.add, dims, strides, pads)
        ones = jnp.ones_like(xf)
        cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strides, pads)
        out = s / cnt
    else:
        raise ValueError(mode)
    return out.astype(x.dtype)
