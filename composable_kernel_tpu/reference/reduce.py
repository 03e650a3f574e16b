"""Reference reductions (CK reference for device_reduce.hpp).

CK's reduction accumulation functors (``utility/reduction_operator.hpp``):
Add, Mul, Max, Min, AbsMax (AMAX), Avg, Norm2 — with optional unary pre-op
(square for norm2, abs for amax) applied before accumulation.
"""

from __future__ import annotations

import jax.numpy as jnp

_REDUCERS = {
    "add": lambda x, axis: jnp.sum(x, axis=axis),
    "avg": lambda x, axis: jnp.mean(x, axis=axis),
    "mul": lambda x, axis: jnp.prod(x, axis=axis),
    "max": lambda x, axis: jnp.max(x, axis=axis),
    "min": lambda x, axis: jnp.min(x, axis=axis),
    "amax": lambda x, axis: jnp.max(jnp.abs(x), axis=axis),
    "norm2": lambda x, axis: jnp.sqrt(jnp.sum(jnp.square(x), axis=axis)),
}


def ref_reduce(x, axes, op: str = "add", keepdims: bool = False, out_dtype=None):
    xf = x.astype(jnp.float32)
    axes = tuple(axes) if not isinstance(axes, int) else (axes,)
    out = _REDUCERS[op](xf, axes)
    if keepdims:
        for a in sorted(axes):
            out = jnp.expand_dims(out, a)
    return out.astype(out_dtype or x.dtype)
