"""Problem descriptions for the host codegen layer.

CK analog: ``ck::host::device_gemm_multiple_d::Problem`` — a plain struct
of (TransA, TransB, M, N, K, dtypes, CDElementOp) whose ``GetSolutions``
enumerates instances (``codegen/include/ck/host/device_gemm_multiple_d/
problem.hpp``, ``codegen/src/device_gemm_multiple_d.cpp:14-33``). Here a
Problem knows its abstract argument shapes (for AOT lowering/export) and
which instance registry family supplies its configs.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(tuple(shape), jnp.dtype(dtype))


@dataclass(frozen=True)
class GemmMultipleDProblem:
    """C[M,N] = epilogue(A[M,K] @ B[K,N], *Ds) — CK gemm_multiple_d.

    ``epilogue`` is a name from ``ops.epilogues.UNARY``/``BINARY``, or
    ``None`` for the raw GEMM; ``epilogue_src`` may instead carry an
    arbitrary Python expression string ``lambda acc, *ds: ...`` — the
    analog of the reference's free-form prologue/epilogue source strings
    (``operation.hpp:22-50`` takes them as ``std::string``).
    """

    m: int
    n: int
    k: int
    a_dtype: str = "bfloat16"
    b_dtype: str = "bfloat16"
    out_dtype: str | None = None
    epilogue: str | None = None
    epilogue_src: str | None = None
    # shapes of extra D operands: each () -> [N] bias row or (m, n)
    d_shapes: tuple = field(default=())
    # D operands are epilogue inputs applied on the f32 accumulator
    # (CK CDEElementOp), so they default to f32 (bias convention)
    d_dtype: str = "float32"

    family = "gemm"

    def key(self) -> str:
        # deterministic digest: Python hash() is randomized per process
        # (PYTHONHASHSEED) and the key names the AotCache file — a random
        # suffix would defeat the cross-restart disk cache
        ep = self.epilogue or (
            "src" + hashlib.sha256(self.epilogue_src.encode()).hexdigest()[:8]
            if self.epilogue_src
            else "none"
        )
        return (
            f"gemm_multiple_d_m{self.m}n{self.n}k{self.k}"
            f"_{self.a_dtype}_{self.b_dtype}_{ep}_d{len(self.d_shapes)}"
        )

    def abstract_args(self):
        args = [
            _sds((self.m, self.k), self.a_dtype),
            _sds((self.k, self.n), self.b_dtype),
        ]
        for ds in self.d_shapes:
            args.append(_sds(ds if ds else (self.n,), self.d_dtype))
        return tuple(args)


@dataclass(frozen=True)
class WoQuantGemmProblem:
    """Weight-only dequant GEMM (north star): A[M,K]·dequant(Bq)[K,N].

    int8 per-channel or packed-int4 group-wise, matching
    ``ops.quant.dequant_gemm``. Beyond the reference codegen's coverage —
    included because this is the framework's headline op family (CK's
    analog instances live in the normal instance library,
    ``device_gemm_dequantB.hpp:24``).
    """

    m: int
    n: int
    k: int
    weight_dtype: str = "int4"  # "int4" (packed, group scales) | "int8"
    group_size: int | None = 128
    a_dtype: str = "bfloat16"
    epilogue: str | None = None
    epilogue_src: str | None = None
    d_shapes: tuple = field(default=())
    d_dtype: str = "float32"

    family = "wo_quant_gemm"

    def __post_init__(self):
        assert self.weight_dtype in ("int4", "int8"), self.weight_dtype
        if self.weight_dtype == "int4":
            assert self.group_size and self.k % self.group_size == 0
        else:
            assert self.group_size is None, "int8 path is per-channel"

    def key(self) -> str:
        g = f"g{self.group_size}" if self.group_size else "perchan"
        ep = self.epilogue or "none"
        return (
            f"wo_quant_gemm_m{self.m}n{self.n}k{self.k}"
            f"_{self.weight_dtype}_{g}_{self.a_dtype}_{ep}_d{len(self.d_shapes)}"
        )

    def abstract_args(self):
        if self.weight_dtype == "int4":
            bq = _sds((self.k // 2, self.n), "int8")
            scales = _sds((self.k // self.group_size, self.n), "float32")
        else:
            bq = _sds((self.k, self.n), "int8")
            scales = _sds((self.n,), "float32")
        args = [_sds((self.m, self.k), self.a_dtype), bq, scales]
        for ds in self.d_shapes:
            args.append(_sds(ds if ds else (self.n,), self.d_dtype))
        return tuple(args)


@dataclass(frozen=True)
class GroupedConvFwdProblem:
    """Grouped conv forward — CK codegen's second op family
    (``codegen/src/`` grouped_conv_fwd emitters; semantics of
    ``device_grouped_conv_fwd_multiple_abd_xdl_cshuffle.hpp``).

    Channels-last activation [N, *spatial, C]; filter [*filter, C/G, K].
    """

    batch: int
    spatial: tuple
    in_channels: int
    out_channels: int
    filter: tuple
    groups: int = 1
    strides: tuple | None = None
    dilations: tuple | None = None
    padding: str = "SAME"
    dtype: str = "bfloat16"
    epilogue: str | None = None
    epilogue_src: str | None = None
    d_shapes: tuple = field(default=())

    family = "conv_fwd"

    def key(self) -> str:
        sp = "x".join(map(str, self.spatial))
        f = "x".join(map(str, self.filter))
        ep = self.epilogue or "none"
        return (
            f"grouped_conv_fwd_n{self.batch}_{sp}_c{self.in_channels}"
            f"_k{self.out_channels}_f{f}_g{self.groups}_{self.dtype}_{ep}"
        )

    def abstract_args(self):
        x = _sds((self.batch, *self.spatial, self.in_channels), self.dtype)
        w = _sds(
            (*self.filter, self.in_channels // self.groups, self.out_channels),
            self.dtype,
        )
        args = [x, w]
        for ds in self.d_shapes:
            args.append(_sds(ds if ds else (self.out_channels,), self.dtype))
        return tuple(args)


@dataclass(frozen=True)
class AttentionProblem:
    """FMHA forward — the attention-family codegen analog of the
    reference's per-config instance generator + traits dispatcher
    (``example/ck_tile/01_fmha/generate.py`` emits one .cpp per
    (dtype, hdim, mode, bias, mask, ...) config; ``fmha_fwd.hpp:438-514``
    dispatches ``fmha_fwd_traits`` onto the generated symbols). Here a
    problem enumerates AttentionConfig instances from the registry and
    each Solution is an emitted module binding one config; the traits
    dispatcher is :func:`composable_kernel_tpu.codegen.dispatch_attention`.

    mode:
      "batch"  — ``flash_attention`` over [B, Hq, Sq, D] (causal/window/
                 alibi traits; int8 KV via kv_cache="int8").
      "decode" — ``decode_attention`` head-grouped single-token decode
                 over a [B, Hkv, S, D] cache (seq_q is the small chunk).
    (The varlen group mode keeps runtime geometry args — packed starts/
    lens — so it is dispatched at the API layer, not emitted per-shape.)
    """

    batch: int
    n_heads: int
    n_kv_heads: int
    seq_q: int
    seq_kv: int
    head_dim: int
    dtype: str = "bfloat16"
    mode: str = "batch"
    causal: bool = True
    window: int | None = None
    alibi: bool = False
    lse: bool = False
    dropout: float = 0.0
    kv_cache: str = "none"  # "none" | "int8" (per-head scales)

    family = "attention"

    def __post_init__(self):
        assert self.mode in ("batch", "decode"), self.mode
        assert self.kv_cache in ("none", "int8"), self.kv_cache
        assert self.n_heads % self.n_kv_heads == 0
        if self.mode == "decode":
            assert not self.alibi and not self.lse and self.dropout == 0.0

    def key(self) -> str:
        traits = [self.mode, self.dtype, f"hd{self.head_dim}"]
        traits.append("causal" if self.causal else "full")
        if self.window:
            traits.append(f"w{self.window}")
        if self.alibi:
            traits.append("alibi")
        if self.lse:
            traits.append("lse")
        if self.dropout:
            traits.append(f"do{self.dropout}")
        if self.kv_cache != "none":
            traits.append(f"kv{self.kv_cache}")
        shape = (
            f"b{self.batch}h{self.n_heads}g{self.n_kv_heads}"
            f"sq{self.seq_q}skv{self.seq_kv}"
        )
        return "fmha_fwd_" + "_".join(traits) + "_" + shape

    def abstract_args(self):
        b, hq, hkv, d = self.batch, self.n_heads, self.n_kv_heads, self.head_dim
        kv_dtype = "int8" if self.kv_cache == "int8" else self.dtype
        if self.mode == "decode":
            args = [
                _sds((b, hq, self.seq_q, d), self.dtype),
                _sds((b, hkv, self.seq_kv, d), kv_dtype),
                _sds((b, hkv, self.seq_kv, d), kv_dtype),
                _sds((b,), "int32"),  # kv_seq_len
            ]
        else:
            args = [
                _sds((b, hq, self.seq_q, d), self.dtype),
                _sds((b, hkv, self.seq_kv, d), kv_dtype),
                _sds((b, hkv, self.seq_kv, d), kv_dtype),
            ]
        if self.kv_cache == "int8":
            args += [_sds((b, hkv), "float32"), _sds((b, hkv), "float32")]
        if self.alibi:
            args.append(_sds((hq,), "float32"))
        return tuple(args)
