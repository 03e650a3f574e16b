"""GEMM public API — the "Client API" layer.

TPU analog of CK's type-erased client path (SURVEY.md §3.2): pick the op
family, get instances from the registry, filter by supported-predicate,
autotune, run. ``gemm()`` is the everything-GEMM entry point covering CK's
device_gemm / device_gemm_multiple_d / device_gemm_splitk surfaces; batched
and grouped variants cover device_batched_gemm / device_grouped_gemm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from composable_kernel_tpu.ops.gemm.config import GemmConfig, is_supported
from composable_kernel_tpu.ops.gemm.kernel import pallas_gemm
from composable_kernel_tpu.tuning import autotune, registry


def _heuristic_config(m: int, n: int, k: int) -> GemmConfig:
    """Shape-keyed default (CK's 'default instance' role). The autotuner
    refines; this picks sane block shapes per regime."""
    if m <= 32:  # decode: skinny M, stream B
        return GemmConfig(block_m=32, block_n=512, block_k=512)
    if m <= 128:
        return GemmConfig(block_m=128, block_n=256, block_k=512)
    if min(m, n, k) >= 1024:
        return GemmConfig(block_m=512, block_n=1024, block_k=1024)
    return GemmConfig(block_m=256, block_n=256, block_k=256)


def gemm(
    a,
    b,
    ds=(),
    *,
    a_op=None,
    b_op=None,
    c_op=None,
    out_dtype=None,
    config: GemmConfig | None = None,
    tune: bool = False,
    interpret: bool | None = None,
):
    """C = c_op(a_op(A) @ b_op(B), *Ds) via the Pallas GEMM kernel.

    With ``tune=True``, runs the registry's supported instances through the
    autotuner (persistent cache) and uses the winner — the programmatic
    equivalent of running ``ckprof gemm`` then using the best instance.
    """
    m, k = a.shape
    n = b.shape[1]
    if config is None:
        if tune:
            cfgs = registry.get_instances("gemm", m, n, k)
            config, _ = autotune(
                "gemm",
                f"{m}x{n}x{k}_{a.dtype}_{b.dtype}",
                cfgs,
                lambda cfg: pallas_gemm(
                    a, b, ds, config=cfg, a_op=a_op, b_op=b_op, c_op=c_op,
                    out_dtype=out_dtype, interpret=interpret,
                ),
                flops=2.0 * m * n * k,
                chain_args=(
                    lambda cfg: (
                        lambda a_, b_: pallas_gemm(
                            a_, b_, ds, config=cfg, a_op=a_op, b_op=b_op,
                            c_op=c_op, out_dtype=out_dtype, interpret=interpret,
                        )
                    ),
                    (a, b),
                ),
            )
        else:
            config = _heuristic_config(m, n, k)
    return pallas_gemm(
        a, b, ds,
        config=config, a_op=a_op, b_op=b_op, c_op=c_op,
        out_dtype=out_dtype, interpret=interpret,
    )


def batched_gemm(a, b, ds=(), *, c_op=None, out_dtype=None, config=None, interpret=None):
    """C[G,M,N] = c_op(A[G,M,K] @ B[G,K,N], *Ds) — vmapped Pallas GEMM.

    CK: device_batched_gemm.hpp family. On TPU, vmap lifts the batch dim
    into the kernel grid; XLA fuses the batch loop.
    """
    if config is None:
        config = _heuristic_config(a.shape[1], b.shape[2], a.shape[2])

    def one(a2, b2, *ds2):
        return pallas_gemm(
            a2, b2, ds2, config=config, c_op=c_op, out_dtype=out_dtype,
            interpret=interpret,
        )

    return jax.vmap(one)(a, b, *ds)


def grouped_gemm(
    group_sizes,
    a,
    b,
    *,
    scales=None,
    c_op=None,
    out_dtype=None,
    config: GemmConfig | None = None,
    interpret: bool | None = None,
):
    """Ragged grouped GEMM: rows of A are partitioned into G groups, each
    multiplied by its own B matrix.

    a: [sum_M, K] — concatenated per-group activations (M_i rows each)
    b: [G, K, N]  — per-group weights
    group_sizes: [G] int32 — rows per group (static total, dynamic splits)

    TPU analog of CK's grouped GEMM with device-side args
    (device_grouped_gemm_fixed_nk.hpp SetDeviceKernelArgs:56, tile-loop
    variant device_grouped_gemm_tile_loop.hpp:26-95): group boundaries are
    read on-device from ``group_sizes`` via scalar prefetch; the host never
    needs per-group sizes — the continuous-batching / MoE building block.
    """
    from composable_kernel_tpu.ops.gemm.ragged import ragged_gemm

    return ragged_gemm(
        group_sizes, a, b, scales=scales, c_op=c_op, out_dtype=out_dtype,
        config=config, interpret=interpret,
    )


def gemm_reduce(a, b, reduce_ops=("add",), ds=(), *, c_op=None, config=None,
                out_dtype=None, interpret=None):
    """GEMM + row reductions of E over N (CK device_gemm_reduce /
    device_gemm_multiple_d_multiple_r: e.g. bias_add_reduce emitting
    per-row sum and sum-of-squares for a following normalization).

    Returns (e, (r0, r1, ...)) with each r_i = reduce_op_i(e, axis=1).
    Two-pass like CK's cshuffle+atomic reduce: the GEMM kernel writes E,
    XLA fuses the trailing reductions into its consumer.
    """
    from composable_kernel_tpu.ops.reduction import REDUCE_OPS

    e = pallas_gemm(a, b, ds, config=config, c_op=c_op, out_dtype=out_dtype,
                    interpret=interpret)
    ef = e.astype(jnp.float32)
    rs = tuple(REDUCE_OPS[op][0](ef, axis=1) for op in reduce_ops)
    return e, rs


def gemm_layernorm(a, b, gamma, beta, ds=(), *, c_op=None, eps=1e-5,
                   config=None, out_dtype=None, interpret=None):
    """h = layernorm(c_op(A@B, *Ds)) * gamma + beta over N.

    CK analog: device_gemm_multiple_d_layernorm (two-kernel welford fusion,
    gemm_layernorm gridwise pair). Here: Pallas GEMM (+fused epilogue) then
    the Pallas layernorm kernel — the same two-device-pass structure.
    """
    from composable_kernel_tpu.ops.normalization import layernorm

    e = pallas_gemm(a, b, ds, config=config, c_op=c_op,
                    out_dtype=out_dtype or a.dtype, interpret=interpret)
    return layernorm(e, gamma, beta, eps=eps, interpret=interpret)


def batched_gemm_gemm(a, b0, b1, *, acc_op=None, config=None, out_dtype=None,
                      interpret=None):
    """Back-to-back batched GEMM: E[G,M,O] = (op(A@B0))@B1.

    CK analog: device_batched_gemm_gemm / device_batched_gemm_multiple_d_
    gemm_multiple_d (the attention-shaped pipeline without softmax). The
    intermediate stays in HBM between the two Pallas launches; the fully
    fused variant (softmax between) is ops.attention.flash_attention.
    """
    h = batched_gemm(a, b0, config=config, out_dtype=out_dtype or a.dtype,
                     interpret=interpret)
    if acc_op is not None:
        h = acc_op(h.astype(jnp.float32)).astype(out_dtype or a.dtype)
    return batched_gemm(h, b1, config=config, out_dtype=out_dtype,
                        interpret=interpret)


@jax.custom_vjp
def gemm_grad(a, b):
    """Differentiable Pallas GEMM (training path).

    dA = dC @ B^T and dB = A^T @ dC run as transposed Pallas GEMMs — the
    layout change folds into the kernel's BlockSpec index maps via XLA.
    The epilogue-fused ``gemm`` stays VJP-free (CK likewise keeps fused
    device ops inference-side); compose activations outside when training.
    """
    return gemm(a, b)


def _gemm_grad_fwd(a, b):
    return gemm(a, b), (a, b)


def _gemm_grad_bwd(res, dc):
    a, b = res
    da = gemm(dc, b.T, out_dtype=a.dtype)
    db = gemm(a.T, dc, out_dtype=b.dtype)
    return da, db


gemm_grad.defvjp(_gemm_grad_fwd, _gemm_grad_bwd)


def batched_gemm_e_permute(a, b, perm, *, c_op=None, out_dtype=None,
                           config=None, interpret=None):
    """Batched GEMM with fused output permutation
    (CK device_batched_gemm_e_permute.hpp: E written through a permuted
    descriptor). On TPU the transpose folds into the consumer's layout —
    XLA fuses it with the kernel's output write."""
    e = batched_gemm(a, b, c_op=c_op, out_dtype=out_dtype, config=config,
                     interpret=interpret)
    return jnp.transpose(e, perm)
