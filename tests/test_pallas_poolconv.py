"""ops/pallas/poolconv.py — fused k x k max-pool -> 1x1 conv on dense views.

Interpret-mode parity vs the unfused math (NHWC max pool -> 1x1 conv,
reference ResUnet_a/model2.py:54-60) forward, and vs autodiff of the
equivalent jnp expression backward (dx incl. tie splitting, dW, dbias).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resuneta_tpu.ops import dense as dops
from resuneta_tpu.ops.pallas import poolconv


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape) * scale,
        jnp.float32)


def _ref(spec, x, w, b):
    """The mathematical op on the dense view: unpack -> k x k max pool ->
    1x1 conv -> repack. jnp.max's VJP splits gradient equally among ties,
    which is the semantics the kernel commits to."""
    W, C, cout, k = spec
    N, H, L = x.shape
    n = x.reshape(N, H // k, k, W // k, k, C).astype(jnp.float32)
    p = n.max(axis=(2, 4))
    y = jnp.einsum("nhwc,cd->nhwd", p, w.astype(jnp.float32)) + b
    return y.reshape(N, H // k, (W // k) * cout).astype(x.dtype)


class TestForward:
    @pytest.mark.parametrize("k,W", [(2, 32), (4, 64)])
    def test_parity(self, k, W):
        N, H, C, cout = 2, W, 32, 8
        spec = (W, C, cout, k)
        assert poolconv.available(H, W, C, cout, k, interpret=True)
        x = _rand((N, H, W * C), 0)
        w = _rand((C, cout), 1, 0.1)
        b = _rand((cout,), 2, 0.1)
        got = poolconv.pool_conv(spec, True, x, w, b)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_ref(spec, x, w, b)),
                                   rtol=1e-5, atol=1e-5)

    def test_bf16_io(self):
        # PSP runs the trunk in bf16; output dtype and the f32 pool/matmul
        # interior must both hold
        N, H, W, C, cout, k = 1, 32, 32, 32, 8, 2
        spec = (W, C, cout, k)
        x = _rand((N, H, W * C), 3).astype(jnp.bfloat16)
        w = _rand((C, cout), 4, 0.1)
        b = _rand((cout,), 5, 0.1)
        got = poolconv.pool_conv(spec, True, x, w, b)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32),
            np.asarray(_ref(spec, x, w, b), np.float32),
            rtol=2e-2, atol=2e-2)


class TestBackward:
    @pytest.mark.parametrize("k,W", [(2, 32), (4, 64)])
    def test_grads_match_autodiff(self, k, W):
        N, H, C, cout = 2, W, 32, 8
        spec = (W, C, cout, k)
        x = _rand((N, H, W * C), 10)
        w = _rand((C, cout), 11, 0.1)
        b = _rand((cout,), 12, 0.1)
        cot = _rand((N, H // k, (W // k) * cout), 13)

        def f_pl(x, w, b):
            return jnp.sum(poolconv.pool_conv(spec, True, x, w, b) * cot)

        def f_ref(x, w, b):
            return jnp.sum(_ref(spec, x, w, b) * cot)

        g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(x, w, b)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
        for a, r in zip(g_pl, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

    def test_tie_splitting(self):
        # constant-valued windows: every pixel ties; dx must split dz evenly
        # across all k*k positions exactly like jnp.max's VJP
        N, H, W, C, cout, k = 1, 32, 32, 32, 8, 2
        spec = (W, C, cout, k)
        x = jnp.ones((N, H, W * C), jnp.float32)
        w = _rand((C, cout), 20, 0.1)
        b = jnp.zeros((cout,), jnp.float32)
        cot = _rand((N, H // k, (W // k) * cout), 21)

        dx_pl = jax.grad(lambda xx: jnp.sum(
            poolconv.pool_conv(spec, True, xx, w, b) * cot))(x)
        dx_ref = jax.grad(lambda xx: jnp.sum(
            _ref(spec, xx, w, b) * cot))(x)
        np.testing.assert_allclose(np.asarray(dx_pl), np.asarray(dx_ref),
                                   rtol=1e-5, atol=1e-6)

    def test_partial_ties(self):
        # quantized inputs: some windows tie at 2-3 positions, others don't
        N, H, W, C, cout, k = 1, 32, 32, 32, 8, 2
        spec = (W, C, cout, k)
        rng = np.random.default_rng(22)
        x = jnp.asarray(rng.integers(0, 3, (N, H, W * C)), jnp.float32)
        w = _rand((C, cout), 23, 0.1)
        b = _rand((cout,), 24, 0.1)
        cot = _rand((N, H // k, (W // k) * cout), 25)

        dx_pl = jax.grad(lambda xx: jnp.sum(
            poolconv.pool_conv(spec, True, xx, w, b) * cot))(x)
        dx_ref = jax.grad(lambda xx: jnp.sum(
            _ref(spec, xx, w, b) * cot))(x)
        np.testing.assert_allclose(np.asarray(dx_pl), np.asarray(dx_ref),
                                   rtol=1e-4, atol=1e-5)


class TestWrapper:
    def test_pool_conv1x1_fallback_parity(self):
        # dense.pool_conv1x1 must give identical math whether it routes to
        # the Pallas kernel or the max_pool + conv1x1 fallback
        N, H, W, C, cout, k = 1, 32, 32, 32, 8, 2
        x = _rand((N, H, W * C), 30)
        kern = _rand((C, 1, cout), 31, 0.1)  # (cin, 1, cout) conv layout
        kern2 = kern.reshape(C, cout)
        b = _rand((cout,), 32, 0.1)
        want = dops.conv1x1(dops.max_pool(x, width=W, channels=C, k=k),
                            kern2, b, cin=C, cout=cout, dtype=jnp.float32)
        import os
        os.environ["RESUNETA_DENSEMM_INTERPRET"] = "1"
        try:
            got = dops.pool_conv1x1(x, kern2, b, cin=C, cout=cout, k=k,
                                    dtype=jnp.float32)
        finally:
            del os.environ["RESUNETA_DENSEMM_INTERPRET"]
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_k1_is_plain_conv(self):
        N, H, W, C, cout = 1, 16, 16, 32, 8
        x = _rand((N, H, W * C), 33)
        kern = _rand((C, cout), 34, 0.1)
        b = _rand((cout,), 35, 0.1)
        got = dops.pool_conv1x1(x, kern, b, cin=C, cout=cout, k=1,
                                dtype=jnp.float32)
        want = dops.conv1x1(x, kern, b, cin=C, cout=cout, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


class TestAvailability:
    def test_gates(self):
        # off-TPU without interpret: refuse
        assert not poolconv.available(32, 32, 32, 8, 2)
        # non-power-of-two k, k < 2, non-divisible H/W: refuse
        assert not poolconv.available(48, 48, 32, 8, 3, interpret=True)
        assert not poolconv.available(32, 32, 32, 8, 1, interpret=True)
        assert not poolconv.available(30, 32, 32, 8, 2, interpret=True)
        assert not poolconv.available(32, 30, 32, 8, 2, interpret=True)
        # W % G != 0: k=4, C=32, cout=8 needs G=64 > W=32
        assert not poolconv.available(32, 32, 32, 8, 4, interpret=True)

    def test_full_res_psp_geometry(self):
        # the production target: final PSP at 256px, C=32 -> quarter=8
        assert poolconv.available(256, 256, 32, 8, 2, interpret=True)
        assert poolconv.available(256, 256, 32, 8, 4, interpret=True)
