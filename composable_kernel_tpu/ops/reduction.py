"""Reduction op family.

CK surface: ``device_reduce.hpp`` / ``device_reduce_multiblock.hpp`` /
``device_reduce_threadwise.hpp`` with accumulation functors from
``utility/reduction_operator.hpp`` (Add, Mul, Min, Max, AbsMax, Avg,
SquaredAdd/Norm2) and pre/post unary ops, plus ``device_multiple_reduce.hpp``
(several reductions of the same input in one pass).

Design stance (SURVEY.md §7): XLA's reduce codegen on TPU is already
optimal — a single fused VPU pass with tree accumulation — and Pallas can't
beat it for a bare reduction; CK's multiblock/threadwise split exists
because GPU thread blocks are small. So this layer is a *semantic* port:
CK's functor/op algebra on jnp, jit-fused by XLA. Reductions that must fuse
into a matmul epilogue use the GEMM kernel's ``c_op`` slot instead
(ops/gemm: device_gemm_reduce analog).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["reduce", "multiple_reduce", "REDUCE_OPS"]


#: CK reduction_operator.hpp functor table: name -> (jnp reducer, identity)
REDUCE_OPS = {
    "add": (jnp.sum, 0.0),
    "avg": (jnp.mean, 0.0),
    "mul": (jnp.prod, 1.0),
    "min": (jnp.min, jnp.inf),
    "max": (jnp.max, -jnp.inf),
    "amax": (lambda x, axis: jnp.max(jnp.abs(x), axis=axis), 0.0),
    "norm2": (lambda x, axis: jnp.sqrt(jnp.sum(x * x, axis=axis)), 0.0),
    "squared_add": (lambda x, axis: jnp.sum(x * x, axis=axis), 0.0),
}


def reduce(
    x,
    axes,
    op: str = "add",
    *,
    in_op=None,
    out_op=None,
    acc_dtype=jnp.float32,
    out_dtype=None,
    keepdims: bool = False,
):
    """y = out_op(reduce_op(in_op(x), axes)) — CK DeviceReduce semantics.

    ``in_op`` / ``out_op``: optional elementwise functors applied before the
    accumulation and after it (CK's InElementwiseOperation /
    AccElementwiseOperation).
    """
    reducer, _ = REDUCE_OPS[op]
    xf = x.astype(acc_dtype)
    if in_op is not None:
        xf = in_op(xf)
    y = reducer(xf, axis=tuple(axes) if not isinstance(axes, int) else axes)
    if keepdims:
        for a in sorted(axes if not isinstance(axes, int) else [axes]):
            y = jnp.expand_dims(y, a)
    if out_op is not None:
        y = out_op(y)
    return y.astype(out_dtype or x.dtype)


def multiple_reduce(x, axes, ops, **kw):
    """Several reductions of one input in one (XLA-fused) pass
    (CK device_multiple_reduce.hpp). Returns a tuple."""
    return tuple(reduce(x, axes, op, **kw) for op in ops)
