"""Normalization training-path tests: bwd-data + bwd-gamma-beta kernels.

CK analogs under test: device_normalization_bwd_data.hpp:21,
device_normalization_bwd_gamma_beta.hpp:21, device_batchnorm_forward.hpp:25,
device_batchnorm_backward.hpp:26. Golden values come from jnp autodiff of
the pure reference forward (SURVEY.md §4 host-reference methodology).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from composable_kernel_tpu.ops import normalization as norm
from composable_kernel_tpu.reference import normalization as rn
from composable_kernel_tpu.utils import check_err, make_tensor


def _mk(shape, dtype=jnp.float32, seed=0):
    return make_tensor(jax.random.PRNGKey(seed), shape, dtype)


def _grads(fn, *args):
    """d(sum(fn(*args)))/d(args) — scalarized so jax.grad applies."""
    return jax.grad(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)),
                    argnums=tuple(range(len(args))))(*args)


@pytest.mark.parametrize("shape", [(16, 256), (4, 8, 384), (5, 129)])
def test_layernorm_grads_match_autodiff(shape):
    x = _mk(shape, seed=1)
    g = _mk(shape[-1:], seed=2)
    b = _mk(shape[-1:], seed=3)

    dx, dg, db = _grads(lambda x, g, b: norm.layernorm(x, g, b), x, g, b)
    rx, rg, rb = _grads(lambda x, g, b: rn.ref_layernorm(x, g, b)[0], x, g, b)
    check_err(dx, rx, rtol=1e-4, atol=1e-5)
    check_err(dg, rg, rtol=1e-4, atol=1e-4)
    check_err(db, rb, rtol=1e-4, atol=1e-4)


def test_layernorm_pre_add_grads():
    x = _mk((8, 256), seed=4)
    r = _mk((8, 256), seed=5)
    g = _mk((256,), seed=6)
    b = _mk((256,), seed=7)
    dx, dr = _grads(
        lambda x, r: norm.layernorm(x, g, b, pre_add=r), x, r)
    rx, rr = _grads(
        lambda x, r: rn.ref_layernorm(x, g, b, pre_add=r)[0], x, r)
    check_err(dx, rx, rtol=1e-4, atol=1e-5)
    check_err(dr, rr, rtol=1e-4, atol=1e-5)
    # the residual enters additively: its grad equals dx
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dr), rtol=1e-6)


@pytest.mark.parametrize("shape", [(16, 256), (2, 6, 512)])
def test_rmsnorm_grads_match_autodiff(shape):
    x = _mk(shape, seed=8)
    g = _mk(shape[-1:], seed=9)
    dx, dg = _grads(lambda x, g: norm.rmsnorm(x, g), x, g)
    rx, rg = _grads(lambda x, g: rn.ref_rmsnorm(x, g), x, g)
    check_err(dx, rx, rtol=1e-4, atol=1e-5)
    check_err(dg, rg, rtol=1e-4, atol=1e-4)


def test_rmsnorm_pre_add_grads():
    x = _mk((8, 128), seed=10)
    r = _mk((8, 128), seed=11)
    g = _mk((128,), seed=12)

    def ref(x, r, g):
        xf = (x + r).astype(jnp.float32)
        ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
        return xf * jax.lax.rsqrt(ms + 1e-6) * g

    dx, dr, dg = _grads(lambda x, r, g: norm.rmsnorm(x, g, pre_add=r), x, r, g)
    rx, rr, rg = _grads(ref, x, r, g)
    check_err(dx, rx, rtol=1e-4, atol=1e-5)
    check_err(dr, rr, rtol=1e-4, atol=1e-5)
    check_err(dg, rg, rtol=1e-4, atol=1e-4)


def test_groupnorm_grads_match_autodiff():
    x = _mk((2, 4, 4, 32), seed=13)
    g = _mk((32,), seed=14)
    b = _mk((32,), seed=15)
    dx, dg, db = _grads(lambda x, g, b: norm.groupnorm(x, g, b, 4), x, g, b)
    rx, rg, rb = _grads(lambda x, g, b: rn.ref_groupnorm(x, g, b, 4), x, g, b)
    check_err(dx, rx, rtol=1e-4, atol=1e-5)
    check_err(dg, rg, rtol=1e-4, atol=1e-4)
    check_err(db, rb, rtol=1e-4, atol=1e-4)


def test_norm_bwd_explicit_api():
    # the CK-style explicit device-op pairing: fwd(save_stats) -> bwd
    x = _mk((16, 384), seed=16)
    g = _mk((384,), seed=17)
    b = _mk((384,), seed=18)
    dy = _mk((16, 384), seed=19)
    y, mean, inv = norm.layernorm(x, g, b, save_stats=True)
    dx, dgamma, dbeta = norm.norm_bwd(dy, x, g, mean, inv)
    _, ref_vjp = jax.vjp(lambda x, g, b: rn.ref_layernorm(x, g, b)[0], x, g, b)
    rx, rg, rb = ref_vjp(dy)
    check_err(dx, rx, rtol=1e-4, atol=1e-5)
    check_err(dgamma, rg, rtol=1e-4, atol=1e-4)
    check_err(dbeta, rb, rtol=1e-4, atol=1e-4)


# ------------------------------------------------------------ batchnorm ------


def _ref_bn_train(x, g, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def test_batchnorm_train_forward():
    x = _mk((2, 4, 4, 64), seed=20)
    g = _mk((64,), seed=21)
    b = _mk((64,), seed=22)
    rm = jnp.zeros((64,), jnp.float32)
    rv = jnp.ones((64,), jnp.float32)
    y, new_rm, new_rv, mean, inv = norm.batchnorm_train(
        x, g, b, rm, rv, momentum=0.1)
    check_err(y, _ref_bn_train(x, g, b), rtol=1e-4, atol=1e-5)
    # running stats: (1-m)*old + m*batch (torch/CK convention, unbiased var)
    xf = np.asarray(x, np.float32).reshape(-1, 64)
    bm = xf.mean(0)
    bv = xf.var(0) * (len(xf) / (len(xf) - 1))
    np.testing.assert_allclose(np.asarray(new_rm), 0.1 * bm, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_rv), 0.9 + 0.1 * bv, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), bm, rtol=1e-4, atol=1e-5)


def test_batchnorm_train_then_infer_consistent():
    # running stats accumulated by train must drive infer toward train's
    # normalization on the same distribution (momentum=1 copies batch stats)
    x = _mk((2, 4, 4, 32), seed=23)
    g = _mk((32,), seed=24)
    b = _mk((32,), seed=25)
    rm = jnp.zeros((32,), jnp.float32)
    rv = jnp.ones((32,), jnp.float32)
    y_tr, new_rm, new_rv, _, _ = norm.batchnorm_train(
        x, g, b, rm, rv, momentum=1.0)
    rows = x.shape[0] * x.shape[1] * x.shape[2]
    biased_rv = new_rv * ((rows - 1) / rows)  # infer consumes biased var
    y_inf = norm.batchnorm_infer(x, g, b, new_rm, biased_rv)
    check_err(y_inf, y_tr, rtol=1e-4, atol=1e-4)


def test_batchnorm_grads_match_autodiff():
    x = _mk((2, 4, 4, 64), seed=26)
    g = _mk((64,), seed=27)
    b = _mk((64,), seed=28)
    rm = jnp.zeros((64,), jnp.float32)
    rv = jnp.ones((64,), jnp.float32)

    def fwd(x, g, b):
        y, *_ = norm.batchnorm_train(x, g, b, rm, rv)
        return y

    dx, dg, db = _grads(fwd, x, g, b)
    rx, rg, rb = _grads(_ref_bn_train, x, g, b)
    check_err(dx, rx, rtol=1e-4, atol=1e-5)
    check_err(dg, rg, rtol=1e-4, atol=1e-4)
    check_err(db, rb, rtol=1e-4, atol=1e-4)


def test_batchnorm_bwd_explicit_api():
    x = _mk((2, 2, 4, 32), seed=29)
    g = _mk((32,), seed=30)
    b = _mk((32,), seed=31)
    dy = _mk((2, 2, 4, 32), seed=32)
    rm = jnp.zeros((32,), jnp.float32)
    rv = jnp.ones((32,), jnp.float32)
    _, _, _, mean, inv = norm.batchnorm_train(x, g, b, rm, rv)
    dx, dgamma, dbeta = norm.batchnorm_bwd(dy, x, g, mean, inv)
    _, ref_vjp = jax.vjp(_ref_bn_train, x, g, b)
    rx, rg, rb = ref_vjp(dy)
    check_err(dx, rx, rtol=1e-4, atol=1e-5)
    check_err(dgamma, rg, rtol=1e-4, atol=1e-4)
    check_err(dbeta, rb, rtol=1e-4, atol=1e-4)
