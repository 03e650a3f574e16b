"""The Pallas GEMM kernel template.

TPU re-design of CK's gridwise GEMM stack
(``gridwise_gemm_xdl_cshuffle_v3.hpp:30-83,1178`` + the blockwise pipelines
``blockwise_gemm_pipeline_xdlops_v1..v5``). One kernel template + a
``GemmConfig`` space replaces CK's zoo of 100+ device-op impl headers:

  - CK's LDS double-buffered K loop        -> Pallas grid K dim ("arbitrary"
    semantics) + Mosaic's automatic input pipelining into VMEM
  - CK's C-shuffle epilogue + multiple-D   -> fused epilogue lambda on the
    f32/i32 accumulator tile, D operands streamed as extra inputs
  - CK's MatrixPadder/GemmSpecialization   -> explicit jnp.pad to block
    multiples (XLA fuses the pad with the producer)
  - CK's split-K device ops                -> a leading "k-split" grid dim
    writing partial outputs, reduced by XLA (device_gemm_xdl_splitk)
  - CK's A/B elementwise ops               -> a_op/b_op lambdas on loaded tiles

The D-operand convention follows CK's GEMM multiple-D contract
(``device_gemm_multiple_d.hpp:33``): each D is broadcastable against [M, N];
we support [M, N] tiles and [N] bias rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from composable_kernel_tpu.ops.gemm.config import GemmConfig
from composable_kernel_tpu.utils import env


def _interpret_default() -> bool:
    if env.get("CKT_INTERPRET"):
        return True
    return jax.default_backend() != "tpu"


def sublane_align(dtype) -> int:
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def pad_to(x, multiples):
    """Pad trailing dims of x up to the given multiples (0 = skip dim)."""
    pads = []
    needs = False
    for dim, mult in zip(x.shape, multiples):
        if mult in (0, None):
            pads.append((0, 0))
            continue
        target = -(-dim // mult) * mult
        pads.append((0, target - dim))
        needs = needs or target != dim
    return jnp.pad(x, pads) if needs else x


def _acc_dtype(a_dtype, b_dtype):
    if jnp.dtype(a_dtype).kind in "iu" and jnp.dtype(b_dtype).kind in "iu":
        return jnp.int32
    return jnp.float32


def _gemm_kernel(
    *refs,
    n_ds: int,
    acc_dtype,
    a_op,
    b_op,
    c_op,
    n_k_steps: int,
):
    """Grid = (split_k, m, n, k). refs = (a, b, *ds, out, acc_scratch)."""
    a_ref, b_ref = refs[0], refs[1]
    d_refs = refs[2 : 2 + n_ds]
    out_ref = refs[2 + n_ds]
    acc_ref = refs[3 + n_ds]

    k_idx = pl.program_id(3)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a_tile = a_ref[...]
    b_tile = b_ref[...]
    if a_op is not None:
        a_tile = a_op(a_tile)
    if b_op is not None:
        b_tile = b_op(b_tile)
    acc_ref[...] += jnp.dot(a_tile, b_tile, preferred_element_type=acc_dtype)

    @pl.when(k_idx == n_k_steps - 1)
    def _finish():
        acc = acc_ref[...]
        if c_op is not None:
            ds = [d[...] for d in d_refs]
            acc = c_op(acc, *ds)
        out_ref[...] = acc.astype(out_ref.dtype).reshape(out_ref.shape)


def pallas_gemm(
    a,
    b,
    ds=(),
    *,
    config: GemmConfig | None = None,
    a_op=None,
    b_op=None,
    c_op=None,
    out_dtype=None,
    interpret: bool | None = None,
):
    """out[M, N] = c_op(a_op(a)[M, K] @ b_op(b)[K, N], *ds).

    ``ds`` entries may be [M, N] or [N] (bias row). When ``c_op`` is given it
    is applied once, on the full-precision accumulator, in the epilogue —
    exactly CK's CDEElementOp placement.
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2, f"inner dims mismatch {k} vs {k2}"
    if out_dtype is None:
        out_dtype = a.dtype if jnp.issubdtype(a.dtype, jnp.floating) else jnp.int32
    if interpret is None:
        interpret = _interpret_default()
    acc_dtype = _acc_dtype(a.dtype, b.dtype)

    cfg = (config or GemmConfig()).shrink_to(m, n, k)
    # TPU tile alignment: block second-minor dims per input dtype, minor 128.
    m_align = max(sublane_align(a.dtype), sublane_align(out_dtype))
    k_align = max(sublane_align(b.dtype), 128)  # k is minor of a, 2nd-minor of b
    bm = max(m_align, -(-cfg.block_m // m_align) * m_align)
    bn = max(128, -(-cfg.block_n // 128) * 128)
    bk = max(k_align, -(-cfg.block_k // k_align) * k_align)
    bm, bn, bk = min(bm, _ceil_mult(m, m_align)), min(bn, _ceil_mult(n, 128)), min(
        bk, _ceil_mult(k, k_align)
    )

    a_p = pad_to(a, (bm, bk))
    b_p = pad_to(b, (bk, bn))
    mp, kp = a_p.shape
    np_ = b_p.shape[1]

    split_k = cfg.split_k
    k_steps_total = kp // bk
    if split_k > 1 and k_steps_total % split_k != 0:
        # Hard error, not a silent split_k=1 reset: an autotuner must never
        # "select" a config that did not run as specified (VERDICT r1 #9).
        # config.is_supported() rejects these up front.
        raise ValueError(
            f"{cfg.name()}: split_k={split_k} does not divide the "
            f"{k_steps_total} K-steps of K={kp} at block_k={bk}"
        )
    n_k_steps = k_steps_total // split_k
    # With split-K the epilogue must run after the cross-split reduction, so
    # the kernel emits raw accumulator partials and we finish outside
    # (CK two-stage split-K: partials + reduction kernel).
    kernel_c_op = c_op if split_k == 1 else None
    kernel_out_dtype = out_dtype if split_k == 1 else acc_dtype
    kernel_ds = ds if split_k == 1 else ()

    ds_p = []
    d_specs = []
    for d in kernel_ds:
        if d.ndim == 1:
            d2 = pad_to(d.reshape(1, -1), (0, bn))
            ds_p.append(d2)
            d_specs.append(
                pl.BlockSpec((1, bn), lambda s, i, j, kk: (0, j), memory_space=pltpu.VMEM)
            )
        else:
            d2 = pad_to(d, (bm, bn))
            ds_p.append(d2)
            d_specs.append(
                pl.BlockSpec(
                    (bm, bn), lambda s, i, j, kk: (i, j), memory_space=pltpu.VMEM
                )
            )

    grid = (split_k, mp // bm, np_ // bn, n_k_steps)

    kernel = functools.partial(
        _gemm_kernel,
        n_ds=len(ds_p),
        acc_dtype=acc_dtype,
        a_op=a_op,
        b_op=b_op,
        c_op=kernel_c_op,
        n_k_steps=n_k_steps,
    )

    out_shape = jax.ShapeDtypeStruct(
        (split_k, mp, np_) if split_k > 1 else (mp, np_), kernel_out_dtype
    )
    if split_k > 1:
        out_spec = pl.BlockSpec(
            (1, bm, bn), lambda s, i, j, kk: (s, i, j), memory_space=pltpu.VMEM
        )
    else:
        out_spec = pl.BlockSpec(
            (bm, bn), lambda s, i, j, kk: (i, j), memory_space=pltpu.VMEM
        )

    flops = 2 * mp * np_ * kp
    bytes_accessed = int(
        mp * kp * a_p.dtype.itemsize
        + kp * np_ * b_p.dtype.itemsize
        + mp * np_ * jnp.dtype(out_dtype).itemsize
    )

    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (bm, bk),
                    functools.partial(_a_index, n_k_steps=n_k_steps),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (bk, bn),
                    functools.partial(_b_index, n_k_steps=n_k_steps),
                    memory_space=pltpu.VMEM,
                ),
                *d_specs,
            ],
            out_specs=out_spec,
            scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # opt-in scoped-VMEM raise (see GemmConfig.vmem_limit_mb)
            vmem_limit_bytes=(
                cfg.vmem_limit_mb * 1024 * 1024 if cfg.vmem_limit_mb else None
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(a_p, b_p, *ds_p)

    if split_k > 1:
        acc = out.sum(axis=0)[:m, :n]
        if c_op is not None:
            acc = c_op(acc, *[jnp.asarray(d, jnp.float32) for d in ds])
        return acc.astype(out_dtype)
    if (mp, np_) != (m, n):
        out = out[:m, :n]
    return out


def _a_index(s, i, j, kk, *, n_k_steps):
    return (i, s * n_k_steps + kk)


def _b_index(s, i, j, kk, *, n_k_steps):
    return (s * n_k_steps + kk, j)


def _ceil_mult(x, m):
    return -(-x // m) * m
