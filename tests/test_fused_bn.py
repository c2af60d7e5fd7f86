"""Fused BatchNorm (ops/fused_bn.py + models/norm.py) parity vs flax.linen.BatchNorm.

The closed-form VJP must reproduce autodiff of the textbook expression: same
forward, same running-statistics update, same gradients (to float tolerance),
with and without the fused ReLU, and the shared-statistics path must be
identical to per-branch statistics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from resuneta_tpu.ops.fused_bn import bn_stats, batch_norm_act
from resuneta_tpu.models.norm import BatchNorm


def _flax_bn_apply(x, variables, train, relu):
    bn = nn.BatchNorm(use_running_average=not train, momentum=0.99, epsilon=1e-3)
    if train:
        y, upd = bn.apply(variables, x, mutable=["batch_stats"])
    else:
        y, upd = bn.apply(variables, x), None
    if relu:
        y = jnp.maximum(y, 0)
    return y, upd


@pytest.fixture
def data():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, 8, 8, 6)), jnp.float32) * 2.0 + 0.5
    variables = {
        "params": {
            "scale": jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.3 + 1),
            "bias": jnp.asarray(rng.standard_normal(6).astype(np.float32) * 0.2),
        },
        "batch_stats": {
            "mean": jnp.asarray(rng.standard_normal(6).astype(np.float32)),
            "var": jnp.asarray(np.abs(rng.standard_normal(6)).astype(np.float32) + 0.5),
        },
    }
    return x, variables


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("train", [False, True])
def test_forward_and_running_stats_parity(data, relu, train):
    x, variables = data
    ref, upd = _flax_bn_apply(x, variables, train, relu)

    mod = BatchNorm(act=relu)
    if train:
        got, upd2 = mod.apply(variables, x, train=True, mutable=["batch_stats"])
        for k in ("mean", "var"):
            np.testing.assert_allclose(upd2["batch_stats"][k],
                                       upd["batch_stats"][k], rtol=1e-5, atol=1e-6)
    else:
        got = mod.apply(variables, x, train=False)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("relu", [False, True])
def test_gradient_parity(data, relu):
    x, variables = data

    def loss_ref(params, x):
        y, _ = _flax_bn_apply(x, {"params": params,
                                  "batch_stats": variables["batch_stats"]},
                              train=True, relu=relu)
        return jnp.sum(y * y)

    def loss_fused(params, x):
        y, _ = BatchNorm(act=relu).apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(y * y)

    (l1, gp1), gx1 = jax.value_and_grad(loss_ref, argnums=(0,))(variables["params"], x), \
        jax.grad(loss_ref, argnums=1)(variables["params"], x)
    (l2, gp2), gx2 = jax.value_and_grad(loss_fused, argnums=(0,))(variables["params"], x), \
        jax.grad(loss_fused, argnums=1)(variables["params"], x)

    np.testing.assert_allclose(l2, l1, rtol=1e-5)
    np.testing.assert_allclose(gx2, gx1, rtol=1e-4, atol=1e-4)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(gp2[0][k], gp1[0][k], rtol=1e-4, atol=1e-4)


def test_shared_stats_match_per_branch(data):
    x, variables = data
    mean, var = bn_stats(x)
    direct = BatchNorm(act=True).apply(variables, x, train=True,
                                       mutable=["batch_stats"])[0]
    shared = BatchNorm(act=True).apply(variables, x, train=True,
                                       stats=(mean, var),
                                       mutable=["batch_stats"])[0]
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(shared))


def test_bfloat16_compute_close_to_flax(data):
    x, variables = data
    xb = x.astype(jnp.bfloat16)
    ref, _ = _flax_bn_apply(xb, variables, train=True, relu=True)
    got, _ = BatchNorm(act=True, dtype=jnp.bfloat16).apply(
        variables, xb, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), rtol=0.05, atol=0.05)


def test_functional_grad_vs_numerical():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 3)), jnp.float32)
    gamma = jnp.asarray([1.2, 0.8, -0.5], jnp.float32)
    beta = jnp.asarray([0.1, -0.2, 0.3], jnp.float32)

    def f(x, gamma, beta):
        mean, var = bn_stats(x)
        y = batch_norm_act(x, gamma, beta, mean, var, eps=1e-3, relu=True)
        return jnp.sum(jnp.sin(y))

    g = jax.grad(f, argnums=(0, 1, 2))(x, gamma, beta)
    eps = 1e-3
    for argnum, arg in ((1, gamma), (2, beta)):
        num = np.zeros(arg.shape, np.float32)
        for i in range(arg.size):
            d = np.zeros(arg.shape, np.float32)
            d[i] = eps
            args_p = [x, gamma, beta]
            args_m = [x, gamma, beta]
            args_p[argnum] = arg + d
            args_m[argnum] = arg - d
            num[i] = (f(*args_p) - f(*args_m)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[argnum]), num, rtol=2e-2, atol=2e-3)
