"""Test-tensor generators, mirroring CK's host-tensor fill utilities.

Reference: ``library/include/ck/library/utility/fill.hpp`` and
``host_tensor_generator.hpp`` — uniform-int, uniform-float, trig-value and
constant fills keyed by dtype, used by every example/test to initialize
inputs deterministically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def make_tensor(key, shape, dtype, kind: str = "uniform"):
    """Generate a test tensor.

    kinds:
      - "uniform":  U(-1, 1) floats / U[-5, 5] ints  (CK FillUniformDistribution)
      - "int":      small integer-valued floats in [-5, 5] — exact in fp16/bf16,
                    used for bit-exactness checks (CK FillUniformDistributionIntegerValue)
      - "trig":     sin(linspace) values (CK GeneratorTensor_3-style smooth data)
      - "ones" / "zeros" / "iota"
    """
    dtype = jnp.dtype(dtype)
    if kind == "zeros":
        return jnp.zeros(shape, dtype)
    if kind == "ones":
        return jnp.ones(shape, dtype)
    if kind == "iota":
        n = int(np.prod(shape))
        return (jnp.arange(n) % 13 - 6).reshape(shape).astype(dtype)
    if dtype.kind in "iu":
        info = jnp.iinfo(dtype)
        lo, hi = max(info.min, -5), min(info.max, 6)
        return jax.random.randint(key, shape, lo, hi, jnp.int32).astype(dtype)
    if kind == "uniform":
        return jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0).astype(dtype)
    if kind == "int":
        return jax.random.randint(key, shape, -5, 6, jnp.int32).astype(dtype)
    if kind == "trig":
        n = int(np.prod(shape))
        return jnp.sin(jnp.linspace(0.0, 32.0, n)).reshape(shape).astype(dtype)
    raise ValueError(f"unknown fill kind {kind!r}")


def split_keys(seed: int, n: int):
    return list(jax.random.split(jax.random.PRNGKey(seed), n))
