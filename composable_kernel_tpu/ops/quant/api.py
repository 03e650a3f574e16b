"""Quantized-GEMM client API.

Covers CK's quantized operator surface:

  - weight-only dequant GEMM (``device_gemm_dequantB.hpp:24``,
    ``device_fpAintB_gemm_wmma.hpp:70``; bf16xint8 multi-ABD client
    ``client_example/30_gemm_bf16Aint8B``) -> :func:`wo_quant_gemm`
  - int8 activation-quant GEMM with requant epilogues
    (``example/14_gemm_quantization``; op zoo
    ``quantization_operation.hpp:25-251``) -> :func:`int8_gemm`
"""

from __future__ import annotations

import jax.numpy as jnp

from composable_kernel_tpu.ops.gemm.config import GemmConfig
from composable_kernel_tpu.ops.gemm.kernel import _ceil_mult
from composable_kernel_tpu.ops.gemm.kernel import pallas_gemm
from composable_kernel_tpu.ops.quant.kernel import dequant_gemm
from composable_kernel_tpu.tuning import autotune, registry

__all__ = ["wo_quant_gemm", "int8_gemm", "dequant_gemm"]


def _decode_bn(n: int) -> int:
    """Decode N blocking: whole-N when the dequant tile fits VMEM.

    Measured on v5e (M=8, bk=1024, int4 g=128): a SINGLE whole-N block is
    ~2x a split one (N=11008: 590 vs 302 GB/s; N=6144: 571; N=4096: 552) —
    with one N block the k-loop is the only grid dimension that moves, so
    Mosaic streams B contiguously with full double-buffering. Past
    N~12k the whole-N dequant tile (bk*N*2B > 24 MiB) degrades (N=14336:
    500 whole vs 541 split; N=28672: 508 whole vs 563 at bn=7168), so split
    into even chunks of <= 7168.
    """
    from composable_kernel_tpu import indexing

    if n <= 12288:
        return max(-(-n // 128) * 128, 128)
    for nb in range(2, 64):
        bn = -(-n // nb // 128) * 128
        if bn <= 7168:
            # snap to a divisor of N: a non-dividing block pads the weight
            # matrix per call, a full HBM copy inside the decode loop when
            # weights are jit arguments (indexing.snap_divisor_bn)
            return indexing.snap_divisor_bn(n, bn)
    return indexing.snap_divisor_bn(n, 7168)


def _heuristic_config(m: int, n: int, k: int) -> GemmConfig:
    if m <= 64:
        # decode: HBM-bound; whole-N blocks + bk=1024 sustain 540-590 GB/s
        # (int4) / ~91% HBM SOL (int8) on v5e. The wide dequant tile needs
        # the scoped-VMEM raise (harmless in this bandwidth-bound regime).
        return GemmConfig(
            block_m=32 if m <= 32 else 64,
            block_n=_decode_bn(n),
            block_k=1024,
            vmem_limit_mb=80,
        )
    if m <= 128:
        return GemmConfig(block_m=128, block_n=512, block_k=512)
    # prefill: whole-N blocks win here too (no N loop -> each packed/scale
    # tile converted exactly once; measured M=3840 N=4096: 184 TF = 93% of
    # the 197 TF MXU peak vs 175-177 for split-N; M=N=K=1024: 157 vs 78 TF
    # for the old generic default). Needs the scoped-VMEM raise; bounded to
    # n<=4096 so the f32 acc tile stays within reach. Exact-fit block_m:
    # padding M wastes MXU work (960x1024 at M=3840 beat 512-pad by 10%).
    if 1024 <= n <= 4096 and n % 128 == 0:
        if m <= 1024:
            bm = _ceil_mult(m, 8)
        elif m % 768 == 0:
            bm = 768
        elif m % 512 == 0:
            bm = 512
        else:
            bm = 768
        return GemmConfig(block_m=bm, block_n=n, block_k=1024,
                          vmem_limit_mb=64)
    # wide-N fallbacks: exact-fit block_m matters (M=3840: 960x1024x1024 at
    # 176.5 TF vs 160.6 for 512x1024x1024 which pads M to 4096)
    if m % 960 == 0:
        return GemmConfig(block_m=960, block_n=1024, block_k=1024)
    if m % 768 == 0:
        return GemmConfig(block_m=768, block_n=1024, block_k=1024)
    return GemmConfig(block_m=512, block_n=1024, block_k=1024)


def wo_quant_gemm(
    a,
    b_q,
    scales=None,
    ds=(),
    *,
    group_size: int | None = None,
    packed_int4: bool = False,
    pack_blocks: int = 1,
    c_op=None,
    out_dtype=None,
    config: GemmConfig | None = None,
    tune: bool = False,
    interpret: bool | None = None,
):
    """Weight-only-quantized GEMM: C = c_op(A @ dequant(B_q, scales), *Ds).

    The B dequant (int8, or packed int4 two-per-byte) happens inside the
    Pallas kernel, upstream of the MXU — never materialized in HBM.
    ``b_q`` may be a ``prepare_wo_quant`` PreparedWeights (scales=None).
    """
    from composable_kernel_tpu.ops.quant.prepared import PreparedWeights

    if isinstance(b_q, PreparedWeights):
        return dequant_gemm(
            a, b_q, None, ds, config=config, c_op=c_op,
            out_dtype=out_dtype, interpret=interpret,
        )
    m, k = a.shape
    n = b_q.shape[1]
    if config is None:
        if tune:
            cfgs = registry.get_instances("gemm", m, n, k)
            config, _ = autotune(
                "wo_quant_gemm",
                f"{m}x{n}x{k}_{a.dtype}_i{'4' if packed_int4 else '8'}"
                f"_g{group_size or 'chan'}",
                cfgs,
                lambda cfg: dequant_gemm(
                    a, b_q, scales, ds, group_size=group_size,
                    packed_int4=packed_int4, pack_blocks=pack_blocks,
                    config=cfg, c_op=c_op,
                    out_dtype=out_dtype, interpret=interpret,
                ),
                flops=2.0 * m * n * k,
                chain_args=(
                    lambda cfg: (
                        lambda a_, b_, s_: dequant_gemm(
                            a_, b_, s_, ds, group_size=group_size,
                            packed_int4=packed_int4, pack_blocks=pack_blocks,
                            config=cfg, c_op=c_op, out_dtype=out_dtype,
                            interpret=interpret,
                        )
                    ),
                    (a, b_q, scales),
                ),
            )
        else:
            config = _heuristic_config(m, n, k)
    return dequant_gemm(
        a, b_q, scales, ds,
        group_size=group_size, packed_int4=packed_int4,
        pack_blocks=pack_blocks, config=config,
        c_op=c_op, out_dtype=out_dtype, interpret=interpret,
    )


def int8_gemm(
    a_q,
    b_q,
    requant_op,
    ds=(),
    *,
    config: GemmConfig | None = None,
    interpret: bool | None = None,
):
    """int8 x int8 -> int32 MXU accumulate -> requant epilogue -> int8.

    ``requant_op`` is an ``ops.epilogues`` ``*_mul_clamp`` factory result
    (CK Activation_Mul_Clamp family). The int32 accumulation runs on the
    MXU's native int8 path; the requant runs fused on the accumulator tile.
    """
    m, k = a_q.shape
    n = b_q.shape[1]
    if config is None:
        if m <= 128:
            config = _heuristic_config(m, n, k)
        elif k <= 16384 and k % 256 == 0:
            # whole-K blocks: a single K step per tile removes the f32
            # accumulator round-trip through VMEM scratch entirely — the
            # dot feeds the epilogue directly. Measured v5e at the
            # 2048x4096x4096 requant shape: 344 TOPS (87% int8 peak) vs
            # 242 for the best k-looped config; narrow N keeps the int32
            # acc + D tiles inside the scoped raise.
            bm = 1024 if m % 1024 == 0 else (512 if m % 512 == 0 else 1024)
            config = GemmConfig(bm, 512, k, vmem_limit_mb=80)
        else:
            # int8-specific prefill config: int32 residual/acc tiles double
            # the VMEM footprint of the bf16-tuned blocks (a 512x1024x1024
            # block overflows the 16 MB scoped limit with an int32 D
            # operand); measured v5e sweep: 512x2048x1024 + scoped raise =
            # 242 TOPS fused requant (plain kernel ceiling 321 TOPS)
            config = GemmConfig(512, 2048, 1024, vmem_limit_mb=48)
    return pallas_gemm(
        a_q, b_q, ds,
        config=config, c_op=requant_op, out_dtype=jnp.int8, interpret=interpret,
    )
