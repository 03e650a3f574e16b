"""Tensor contraction + complex GEMM op families.

CK surface:

  - ``device_contraction_multiple_d.hpp`` / ``device_batched_contraction_
    multiple_d.hpp`` / ``device_splitk_contraction_multiple_d.hpp`` —
    einsum-style contractions with multi-dim M/N/K and fused D operands.
    CK reduces them to GEMM via descriptor transforms
    (``transform_contraction_to_gemm.hpp``); we do the same reduction with
    reshapes/transposes (XLA folds them into the GEMM's layout) and run the
    S1 Pallas GEMM.
  - ``device_cgemm_4gemm_xdl_cshuffle.hpp`` — complex GEMM as 4 real GEMMs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from composable_kernel_tpu.ops.gemm.config import GemmConfig
from composable_kernel_tpu.ops.gemm.kernel import pallas_gemm

__all__ = ["contraction", "batched_contraction", "cgemm"]


def _group(shape, idxs):
    return int(np.prod([shape[i] for i in idxs])) if idxs else 1


def contraction(
    a,
    b,
    dims_m,
    dims_n,
    dims_k,
    ds=(),
    *,
    c_op=None,
    config: GemmConfig | None = None,
    out_dtype=None,
    interpret=None,
):
    """E[Ms..., Ns...] = c_op(sum_K A[Ms..., Ks...] B[Ns..., Ks...], *Ds).

    ``dims_m``/``dims_k`` index into ``a``'s axes; ``dims_n``/``dims_k``
    into ``b``'s (K axes given as (a_axis, b_axis) pairs). Mirrors CK's
    DeviceContractionMultipleD contract: D operands broadcast against the
    [Ms..., Ns...] output.
    """
    k_a = [p[0] for p in dims_k]
    k_b = [p[1] for p in dims_k]
    a2 = jnp.transpose(a, (*dims_m, *k_a)).reshape(
        _group(a.shape, dims_m), _group(a.shape, k_a)
    )
    b2 = jnp.transpose(b, (*k_b, *dims_n)).reshape(
        _group(b.shape, k_b), _group(b.shape, dims_n)
    )
    out_shape = tuple(a.shape[i] for i in dims_m) + tuple(b.shape[i] for i in dims_n)
    ds2 = tuple(jnp.reshape(d, (-1, b2.shape[1])) if d.ndim > 1 else d for d in ds)
    out = pallas_gemm(
        a2, b2, ds2, config=config, c_op=c_op, out_dtype=out_dtype,
        interpret=interpret,
    )
    return out.reshape(out_shape)


def batched_contraction(a, b, dims_m, dims_n, dims_k, **kw):
    """Leading batch dim on both operands (CK batched_contraction).

    a: [G, ...], b: [G, ...]; dims index the per-sample axes (without G).
    """
    import jax

    def one(a_i, b_i):
        return contraction(a_i, b_i, dims_m, dims_n, dims_k, **kw)

    return jax.vmap(one)(a, b)


def cgemm(
    a_re, a_im, b_re, b_im, *, config=None, out_dtype=None, interpret=None
):
    """Complex GEMM via 4 real GEMMs (CK device_cgemm_4gemm):

    Re = A_re B_re - A_im B_im;  Im = A_re B_im + A_im B_re.
    Returns (c_re, c_im).
    """
    rr = pallas_gemm(a_re, b_re, config=config, out_dtype=jnp.float32,
                     interpret=interpret)
    ii = pallas_gemm(a_im, b_im, config=config, out_dtype=jnp.float32,
                     interpret=interpret)
    ri = pallas_gemm(a_re, b_im, config=config, out_dtype=jnp.float32,
                     interpret=interpret)
    ir = pallas_gemm(a_im, b_re, config=config, out_dtype=jnp.float32,
                     interpret=interpret)
    dt = out_dtype or a_re.dtype
    return (rr - ii).astype(dt), (ri + ir).astype(dt)
