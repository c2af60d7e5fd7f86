"""ops/pallas/densemm.py — layout-pinned dense 1x1 kron matmuls.

Interpret-mode parity vs NHWC convolution (forward) and vs autodiff of the
equivalent jnp expression (backward: dx per part, folded dW per part, dbias).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resuneta_tpu.ops.pallas import densemm


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape) * scale,
        jnp.float32)


def _ref(spec, xs, ws, bias):
    """The mathematical op: (upsample ->) NHWC concat -> 1x1 conv, with
    per-part input ReLU."""
    spec = spec if len(spec) == 5 else spec + ((1,) * len(spec[1]),)
    W, cins, cout, acts, ups = spec
    ns = []
    for x, c, a, k in zip(xs, cins, acts, ups):
        n = x.reshape(x.shape[0], x.shape[1], W // k, c)
        n = jnp.maximum(n, 0) if a else n
        if k > 1:
            n = jnp.repeat(jnp.repeat(n, k, axis=1), k, axis=2)
        ns.append(n)
    cat = jnp.concatenate(ns, -1)
    k = jnp.concatenate([w for w in ws], 0)[None, None]
    y = jax.lax.conv_general_dilated(
        cat, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias
    return y.reshape(y.shape[0], y.shape[1], W * cout)


class TestForward:
    @pytest.mark.parametrize("cin,cout", [(32, 32), (32, 8), (8, 32),
                                          (128, 64)])
    def test_single_part(self, cin, cout):
        N, H, W = 2, 16, 16
        spec = (W, (cin,), cout, (False,))
        xs = (_rand((N, H, W * cin), 0),)
        ws = (_rand((cin, cout), 1, 0.1),)
        b = _rand((cout,), 2, 0.1)
        got = densemm.dense_mm(spec, True, xs, ws, b)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_ref(spec, xs, ws, b)),
                                   rtol=1e-5, atol=1e-5)

    def test_multi_part_with_acts(self):
        # the Combine/PSP-final shape: mixed channel widths, one part ReLU'd
        N, H, W = 1, 8, 16
        cins, cout = (8, 32), 16
        spec = (W, cins, cout, (True, False))
        xs = tuple(_rand((N, H, W * c), i) for i, c in enumerate(cins))
        ws = tuple(_rand((c, cout), 10 + i, 0.1) for i, c in enumerate(cins))
        b = _rand((cout,), 3, 0.1)
        got = densemm.dense_mm(spec, True, xs, ws, b)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_ref(spec, xs, ws, b)),
                                   rtol=1e-5, atol=1e-5)

    def test_narrow_cout_wide_group(self):
        # cout=4 forces G=32 (G*cout >= 128): the head-logits geometry
        N, H, W, cin, cout = 1, 8, 32, 32, 4
        spec = (W, (cin,), cout, (True,))
        xs = (_rand((N, H, W * cin), 5),)
        ws = (_rand((cin, cout), 6, 0.1),)
        b = _rand((cout,), 7, 0.1)
        assert densemm._group((cin,), cout) == (32,)
        got = densemm.dense_mm(spec, True, xs, ws, b)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_ref(spec, xs, ws, b)),
                                   rtol=1e-5, atol=1e-5)


class TestBackward:
    @pytest.mark.parametrize("acts", [(False, False), (True, False)])
    def test_grads_match_autodiff(self, acts):
        N, H, W = 2, 16, 16
        cins, cout = (8, 32), 16
        spec = (W, cins, cout, acts)
        xs = tuple(_rand((N, H, W * c), i) for i, c in enumerate(cins))
        ws = tuple(_rand((c, cout), 20 + i, 0.1) for i, c in enumerate(cins))
        b = _rand((cout,), 9, 0.1)
        cot = _rand((N, H, W * cout), 11)

        def f_pl(xs, ws, b):
            return jnp.sum(densemm.dense_mm(spec, True, xs, ws, b) * cot)

        def f_ref(xs, ws, b):
            return jnp.sum(_ref(spec, xs, ws, b) * cot)

        g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(xs, ws, b)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(xs, ws, b)
        for a, r in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

    def test_relu_mask_on_dx(self):
        # dx must be zeroed exactly where the fused input ReLU clipped
        N, H, W, cin, cout = 1, 8, 16, 32, 32
        spec = (W, (cin,), cout, (True,))
        x = _rand((N, H, W * cin), 30)
        w = (_rand((cin, cout), 31, 0.1),)
        b = jnp.zeros((cout,), jnp.float32)

        def f(xx):
            return jnp.sum(densemm.dense_mm(spec, True, (xx,), w, b))

        dx = jax.grad(f)(x)
        assert np.all(np.asarray(dx)[np.asarray(x) < 0] == 0)
        assert np.any(np.asarray(dx)[np.asarray(x) > 0] != 0)


class TestUpsampleFold:
    """ups > 1 parts: the nearest-x-k upsample folded into the matmul
    (replication-kron columns + lane-space row repeat) must equal
    upsample-then-conv exactly, forward and backward."""

    def _spec_data(self, W, H, cins, cout, acts, ups, seed=0):
        spec = (W, cins, cout, acts, ups)
        xs = tuple(_rand((2, H // k, (W // k) * c), seed + i)
                   for i, (c, k) in enumerate(zip(cins, ups)))
        ws = tuple(_rand((c, cout), seed + 50 + i, 0.1)
                   for i, c in enumerate(cins))
        b = _rand((cout,), seed + 99, 0.1)
        return spec, xs, ws, b

    def test_combine_shape_fwd(self):
        # the Combine geometry: dec pre-upsample (ReLU fused), skip full-res
        spec, xs, ws, b = self._spec_data(
            64, 32, (16, 32), 32, (True, False), (2, 1))
        assert densemm.available(32, 64, (16, 32), 32, (2, 1),
                                 interpret=True)
        got = densemm.dense_mm(spec, True, xs, ws, b)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_ref(spec, xs, ws, b)),
                                   rtol=1e-5, atol=1e-5)

    def test_psp_shape_fwd(self):
        # the PSP final-projection geometry: quarter parts at mixed factors
        spec, xs, ws, b = self._spec_data(
            128, 128, (8, 8, 8, 32), 32, (False,) * 4, (1, 2, 4, 1))
        got = densemm.dense_mm(spec, True, xs, ws, b)
        np.testing.assert_allclose(np.asarray(got),
                                   np.asarray(_ref(spec, xs, ws, b)),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("ups", [(2, 1), (4, 1)])
    def test_grads_match_autodiff(self, ups):
        W = 32 * ups[0]
        spec, xs, ws, b = self._spec_data(
            W, W // 2, (16, 32), 32, (True, False), ups, seed=7)
        cot = _rand((2, W // 2, W * 32), 31)

        def f_pl(xs, ws, b):
            return jnp.sum(densemm.dense_mm(spec, True, xs, ws, b) * cot)

        def f_ref(xs, ws, b):
            return jnp.sum(_ref(spec, xs, ws, b) * cot)

        g_pl = jax.grad(f_pl, argnums=(0, 1, 2))(xs, ws, b)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(xs, ws, b)
        for a, r in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       rtol=2e-4, atol=2e-4)

    def test_ups_alignment_gate(self):
        # (W/k)*c must stay 128-aligned: k=8 at W=64, c=8 gives 64 lanes
        assert not densemm.available(64, 64, (8,), 32, (8,), interpret=True)
        # non-power-of-two factors refuse
        assert not densemm.available(96, 96, (8,), 32, (3,), interpret=True)


class TestAvailability:
    def test_group_sizes(self):
        assert densemm._group((32,), 32) == (4,)
        assert densemm._group((8, 8, 8, 8, 32), 32) == (16, 16, 16, 16, 4)
        assert densemm._group((32,), 5) == (32,)
        assert densemm._group((128,), 128) == (1,)
        # upsampled parts: k | G and the contraction width (G/k)*c >= 128
        assert densemm._group((16, 32), 32, (2, 1)) == (16, 4)
        assert densemm._group((8,), 32, (8,)) == (128,)

    def test_unavailable_off_tpu(self):
        # backend gate: CPU without interpret must refuse
        assert not densemm.available(64, 64, (32,), 32)

    def test_lane_alignment_gate(self):
        # W*cout not a multiple of 128 -> refuse (ps=64 head logits)
        assert not densemm.available(64, 64, (32,), 5, interpret=True)
        # G*cout not a multiple of 128 -> refuse (Mosaic rejects the ragged
        # (Mg, 160) -> (tile, W*5) shape cast); cout=5 never lane-aligns
        assert not densemm.available(256, 256, (32,), 5, interpret=True)
        # power-of-two couts lane-align exactly
        assert densemm.available(256, 256, (32,), 8, interpret=True)
        assert densemm.available(256, 256, (32,), 1, interpret=True)
