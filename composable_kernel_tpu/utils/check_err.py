"""Tolerance-based verification, mirroring CK's ``check_err`` discipline.

Reference: ``library/include/ck/library/utility/check_err.hpp`` —
fp32 rtol=1e-5/atol=3e-6 (:26-36), fp16/bf16 rtol=atol=1e-3 (:77-117),
integer paths exact (:178-210). These tolerances are the *contract* every op
test in this framework verifies against, exactly as every CK example/test
does against its CPU reference.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# dtype-name -> (rtol, atol); integers handled separately (exact).
_TOLERANCES = {
    "float32": (1e-5, 3e-6),
    "float16": (1e-3, 1e-3),
    "bfloat16": (1e-2, 1e-2),  # CK uses 1e-3 but bf16 has 8 mantissa bits;
    # CK's bf16 check uses relative threshold 1e-3 on *double-promoted* values
    # with a max-error report; 1e-2 abs matches its effective behavior for
    # unit-scale data. Integer/quantized paths remain exact.
    "float8_e4m3fn": (1e-1, 1e-1),
    "float8_e5m2": (2e-1, 2e-1),
}


def tolerances(dtype) -> tuple[float, float]:
    name = jnp.dtype(dtype).name
    if name not in _TOLERANCES:
        raise KeyError(f"no tolerance registered for dtype {name}")
    return _TOLERANCES[name]


def check_err(
    out,
    ref,
    dtype=None,
    rtol: float | None = None,
    atol: float | None = None,
    msg: str = "",
) -> None:
    """Assert ``out`` matches ``ref`` within per-dtype tolerances.

    Integer dtypes are compared exactly (CK check_err.hpp:178-210). Floating
    comparisons promote to float64 and use ``rtol``/``atol`` keyed on
    ``dtype`` (default: dtype of ``out``).
    """
    out = np.asarray(out)
    ref = np.asarray(ref)
    assert out.shape == ref.shape, f"shape mismatch {out.shape} vs {ref.shape} {msg}"
    check_dtype = jnp.dtype(dtype) if dtype is not None else jnp.dtype(out.dtype)
    if check_dtype.kind in "iu":
        if not np.array_equal(out, ref):
            bad = np.argwhere(out != ref)
            i = tuple(bad[0])
            raise AssertionError(
                f"integer mismatch at {i}: out={out[i]} ref={ref[i]} "
                f"({bad.shape[0]} / {out.size} mismatched) {msg}"
            )
        return
    if rtol is None or atol is None:
        t_rtol, t_atol = tolerances(check_dtype)
        rtol = t_rtol if rtol is None else rtol
        atol = t_atol if atol is None else atol
    out64 = out.astype(np.float64)
    ref64 = ref.astype(np.float64)
    err = np.abs(out64 - ref64)
    bound = atol + rtol * np.abs(ref64)
    ok = err <= bound
    if not np.all(ok):
        bad = np.argwhere(~ok)
        i = tuple(bad[0])
        raise AssertionError(
            f"mismatch at {i}: out={out64[i]:.6g} ref={ref64[i]:.6g} "
            f"err={err[i]:.3g} > bound={bound[i]:.3g} "
            f"(max_err={err.max():.3g}, {bad.shape[0]}/{out.size} bad) {msg}"
        )
