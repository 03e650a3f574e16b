"""Reference GEMM family.

Mirrors CK's ``reference_gemm.hpp`` / ``reference_batched_gemm.hpp`` /
``reference_contraction.hpp`` and the grouped-GEMM profiler references:
out = c_op( a_op(A) @ b_op(B), *Ds ), accumulating in f32 (or i32 for
integer inputs) like CK's AccDataType.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from composable_kernel_tpu.ops import epilogues as ep

# TPU f32 matmuls default to one-pass bf16 on the MXU; golden references
# must be full-precision (CK references accumulate in fp64-exactness C++).
_HI = jax.lax.Precision.HIGHEST


def _acc_dtype(a, b):
    if jnp.dtype(a.dtype).kind in "iu" and jnp.dtype(b.dtype).kind in "iu":
        return jnp.int32
    return jnp.float32


def ref_gemm(
    a,
    b,
    ds=(),
    a_op=ep.passthrough,
    b_op=ep.passthrough,
    c_op=ep.passthrough,
    out_dtype=None,
):
    """C[M,N] = c_op(a_op(A[M,K]) @ b_op(B[K,N]), *Ds)."""
    acc_t = _acc_dtype(a, b)
    lhs = a_op(a.astype(acc_t) if acc_t == jnp.int32 else a.astype(jnp.float32))
    rhs = b_op(b.astype(acc_t) if acc_t == jnp.int32 else b.astype(jnp.float32))
    acc = jnp.matmul(lhs, rhs, preferred_element_type=acc_t, precision=_HI)
    out = c_op(acc, *[jnp.asarray(d, jnp.float32) for d in ds])
    if out_dtype is None:
        out_dtype = a.dtype if jnp.issubdtype(a.dtype, jnp.floating) else jnp.int32
    return out.astype(out_dtype)


def ref_batched_gemm(a, b, ds=(), c_op=ep.passthrough, out_dtype=None):
    """C[G,M,N] = c_op(A[G,M,K] @ B[G,K,N], *Ds) (reference_batched_gemm.hpp)."""
    acc_t = _acc_dtype(a, b)
    cast = acc_t if acc_t == jnp.int32 else jnp.float32
    acc = jnp.matmul(a.astype(cast), b.astype(cast), preferred_element_type=acc_t, precision=_HI)
    out = c_op(acc, *[jnp.asarray(d, jnp.float32) for d in ds])
    if out_dtype is None:
        out_dtype = a.dtype if jnp.issubdtype(a.dtype, jnp.floating) else jnp.int32
    return out.astype(out_dtype)


def ref_grouped_gemm(a_list, b_list, c_op=ep.passthrough, out_dtype=None):
    """Batch-of-problems GEMM: independent (M_i,K_i)x(K_i,N_i) problems.

    CK: device_grouped_gemm.hpp:34 / reference loop in profile_grouped_gemm.
    """
    return [
        ref_gemm(a, b, c_op=c_op, out_dtype=out_dtype)
        for a, b in zip(a_list, b_list)
    ]


def ref_contraction(a, b, dims_m, dims_n, dims_k, out_dtype=None):
    """Multi-dim M/N/K tensor contraction (device_contraction_multiple_d.hpp).

    ``dims_m``/``dims_k`` index axes of ``a``; ``dims_k2=dims_k`` and
    ``dims_n`` index axes of ``b``. Result has the M axes then N axes.
    """
    import numpy as np

    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    am = [a.shape[i] for i in dims_m]
    ak = [a.shape[i] for i in dims_k[0]]
    bn = [b.shape[i] for i in dims_n]
    a_perm = jnp.transpose(a32, list(dims_m) + list(dims_k[0]))
    b_perm = jnp.transpose(b32, list(dims_k[1]) + list(dims_n))
    a2 = a_perm.reshape(int(np.prod(am)), int(np.prod(ak)))
    b2 = b_perm.reshape(int(np.prod(ak)), int(np.prod(bn)))
    out = jnp.matmul(a2, b2, precision=_HI).reshape(am + bn)
    return out.astype(out_dtype or a.dtype)
