"""ctypes bridge to the native host runtime (native/ckt_native.cpp).

Builds the shared library on first use (g++, cached next to the source and
keyed by source mtime) and exposes the checkpoint-load hot path:
multithreaded dtype conversion, symmetric quantization, int4 packing, and
transpose. Falls back to the jnp/numpy reference implementations when no
compiler is available, so the Python API never breaks.

CK analog: the compiled host-utility layer (HostTensor +
ParallelTensorFunctor, library/src/utility/) that CK ships as C++ because
checkpoint-scale preprocessing through an interpreter is too slow.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "ckt_native.cpp"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build_dir() -> Path:
    d = Path(os.path.expanduser("~/.cache/composable_kernel_tpu"))
    d.mkdir(parents=True, exist_ok=True)
    return d


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _SRC.exists():
            return None
        so = _build_dir() / f"ckt_native_{int(_SRC.stat().st_mtime)}.so"
        if not so.exists():
            try:
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", "-march=native", str(_SRC), "-o", str(so),
                    ],
                    check=True,
                    capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError):
                return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        i64, f32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_float)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        i8p = ctypes.POINTER(ctypes.c_int8)
        lib.ckt_bf16_to_f32.argtypes = [u16p, f32p, i64]
        lib.ckt_f16_to_f32.argtypes = [u16p, f32p, i64]
        lib.ckt_f32_to_bf16.argtypes = [f32p, u16p, i64]
        lib.ckt_quantize_group_int4_pack.argtypes = [
            f32p, i64, i64, i64, i64, i8p, f32p,
        ]
        lib.ckt_quantize_per_channel_int8.argtypes = [f32p, i64, i64, i8p, f32p]
        lib.ckt_transpose_f32.argtypes = [f32p, f32p, i64, i64]
        lib.ckt_version.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bf16_to_f32(raw: np.ndarray) -> np.ndarray:
    """raw: uint16 view of bf16 payload -> f32 array (same shape)."""
    lib = _load()
    if lib is None:
        return (raw.astype(np.uint32) << 16).view(np.float32).astype(np.float32)
    out = np.empty(raw.shape, np.float32)
    lib.ckt_bf16_to_f32(_ptr(np.ascontiguousarray(raw), ctypes.c_uint16),
                        _ptr(out, ctypes.c_float), raw.size)
    return out


def f16_to_f32(raw: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib is None:
        return raw.view(np.float16).astype(np.float32)
    out = np.empty(raw.shape, np.float32)
    lib.ckt_f16_to_f32(_ptr(np.ascontiguousarray(raw), ctypes.c_uint16),
                       _ptr(out, ctypes.c_float), raw.size)
    return out


def f32_to_bf16_raw(x: np.ndarray) -> np.ndarray:
    """f32 -> uint16 bf16 payload (round-to-nearest-even)."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        u = x.view(np.uint32)
        rounded = (u + 0x7FFF + ((u >> 16) & 1)) >> 16
        return rounded.astype(np.uint16)
    out = np.empty(x.shape, np.uint16)
    lib.ckt_f32_to_bf16(_ptr(x, ctypes.c_float), _ptr(out, ctypes.c_uint16),
                        x.size)
    return out


def quantize_group_int4_pack(w: np.ndarray, group: int, blocks: int = 1):
    """f32 [K, N] -> (packed int8 [K/2, N], scales f32 [K/g, N]).

    Split-halves pack per block segment — bit-identical to
    dtypes.pack_int4(ref_quantize_group(w)[0], blocks=blocks).
    """
    k, n = w.shape
    assert k % group == 0 and k % (2 * blocks) == 0
    lib = _load()
    if lib is None:
        import jax.numpy as jnp

        from composable_kernel_tpu import dtypes
        from composable_kernel_tpu.reference.quant import ref_quantize_group

        w_q, s = ref_quantize_group(jnp.asarray(w), group_size=group, bits=4)
        return (
            np.asarray(dtypes.pack_int4(w_q, axis=0, blocks=blocks)),
            np.asarray(s),
        )
    w = np.ascontiguousarray(w, np.float32)
    packed = np.empty((k // 2, n), np.int8)
    scales = np.empty((k // group, n), np.float32)
    lib.ckt_quantize_group_int4_pack(
        _ptr(w, ctypes.c_float), k, n, group, blocks,
        _ptr(packed, ctypes.c_int8), _ptr(scales, ctypes.c_float),
    )
    return packed, scales


def quantize_per_channel_int8(w: np.ndarray):
    """f32 [K, N] -> (int8 [K, N], scales f32 [N])."""
    k, n = w.shape
    lib = _load()
    if lib is None:
        import jax.numpy as jnp

        from composable_kernel_tpu.reference.quant import ref_quantize_per_channel

        w_q, s = ref_quantize_per_channel(jnp.asarray(w), bits=8)
        return np.asarray(w_q), np.asarray(s)
    w = np.ascontiguousarray(w, np.float32)
    out = np.empty((k, n), np.int8)
    scales = np.empty((n,), np.float32)
    lib.ckt_quantize_per_channel_int8(
        _ptr(w, ctypes.c_float), k, n, _ptr(out, ctypes.c_int8),
        _ptr(scales, ctypes.c_float),
    )
    return out, scales


def transpose_f32(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        return np.ascontiguousarray(x.T)
    r, c = x.shape
    out = np.empty((c, r), np.float32)
    lib.ckt_transpose_f32(_ptr(x, ctypes.c_float), _ptr(out, ctypes.c_float), r, c)
    return out
