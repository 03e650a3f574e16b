"""Reference softmax / layernorm / rmsnorm / groupnorm / batchnorm.

Mirrors CK's ``reference_softmax.hpp``, ``reference_layernorm.hpp``,
``reference_groupnorm.hpp``, ``reference_batchnorm_*`` (Welford-based
normalization kernels, device_normalization_fwd.hpp and
device_batchnorm_{forward,infer}.hpp).
"""

from __future__ import annotations

import jax.numpy as jnp


def ref_softmax(x, axis=-1, alpha=1.0, beta=0.0, prior=None):
    """CK softmax semantics (device_softmax.hpp): y = alpha·softmax(x) + beta·prior."""
    xf = x.astype(jnp.float32)
    m = jnp.max(xf, axis=axis, keepdims=True)
    e = jnp.exp(xf - m)
    sm = e / jnp.sum(e, axis=axis, keepdims=True)
    out = alpha * sm
    if beta != 0.0 and prior is not None:
        out = out + beta * prior.astype(jnp.float32)
    return out.astype(x.dtype)


def ref_layernorm(x, gamma, beta, eps=1e-5, axis=-1, pre_add=None):
    """y = gamma·(x-mean)/sqrt(var+eps) + beta.

    ``pre_add``: optional residual added before normalization — CK's fused
    elementwise+layernorm (device_elementwise_normalization.hpp).
    Returns (y, mean, inv_std) like CK's fwd kernels which save mean/invstd.
    """
    xf = x.astype(jnp.float32)
    if pre_add is not None:
        xf = xf + pre_add.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axis, keepdims=True)
    inv_std = (var + eps) ** -0.5
    y = (xf - mean) * inv_std
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype), mean, inv_std


def ref_rmsnorm(x, gamma, eps=1e-6, axis=-1):
    """RMSNorm (the Llama-family norm; CK covers it via layernorm variants)."""
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=axis, keepdims=True)
    y = xf * (ms + eps) ** -0.5 * gamma.astype(jnp.float32)
    return y.astype(x.dtype)


def ref_groupnorm(x, gamma, beta, num_groups, eps=1e-5):
    """GroupNorm over NHWC input grouped on C (reference_groupnorm.hpp)."""
    n, h, w, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, h, w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2, 4), keepdims=True)
    y = (xf - mean) / jnp.sqrt(var + eps)
    y = y.reshape(n, h, w, c) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def ref_batchnorm_infer(x, gamma, beta, mean, var, eps=1e-5):
    """Inference batchnorm over NHWC (device_batchnorm_infer.hpp)."""
    xf = x.astype(jnp.float32)
    y = (xf - mean) / jnp.sqrt(var + eps) * gamma + beta
    return y.astype(x.dtype)
