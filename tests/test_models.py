"""Model topology tests: output shapes/ranges at several patch sizes, and exact
parameter-count parity with the reference Keras graphs.

Parameter anchors were computed once from the reference implementation
(ResUnet_a/model2.py via tf.keras count_params(), incl. BN moving stats;
utils.py:98-133 UNet likewise):
    ResUnet-a multitask  ps=64 : 41,684,434
    ResUnet-a multitask  ps=128: 42,210,554
    ResUnet-a multitask  ps=256: 42,736,674
    ResUnet-a single     ps=256: 42,690,005  (ps=64: 41,637,765)
    UNet (256, 5 classes):        3,523,173
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resuneta_tpu.models import ResUnetA, UNet


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def _init(model, ps, in_ch=3):
    x = jnp.zeros((1, ps, ps, in_ch), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables, x


class TestResUnetA:
    @pytest.mark.parametrize("ps,expected", [(64, 41_684_434), (128, 42_210_554)])
    def test_param_count_multitask(self, ps, expected):
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=True)
        variables, _ = _init(model, ps)
        total = _count(variables["params"]) + _count(variables["batch_stats"])
        assert total == expected

    def test_param_count_singletask(self):
        model = ResUnetA(num_classes=5, img_size=64, multitasking=False)
        variables, _ = _init(model, 64)
        total = _count(variables["params"]) + _count(variables["batch_stats"])
        assert total == 41_637_765

    def test_multitask_outputs(self):
        ps = 64
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=True)
        variables, x = _init(model, ps)
        out = model.apply(variables, jnp.ones_like(x), train=False)
        assert set(out.keys()) == {"seg", "bound", "dist", "color"}
        assert out["seg"].shape == (1, ps, ps, 5)
        assert out["bound"].shape == (1, ps, ps, 5)
        assert out["dist"].shape == (1, ps, ps, 5)
        assert out["color"].shape == (1, ps, ps, 3)
        # softmax heads sum to 1; sigmoid heads within (0, 1)
        np.testing.assert_allclose(np.asarray(out["seg"]).sum(-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["dist"]).sum(-1), 1.0, atol=1e-5)
        assert np.all((np.asarray(out["bound"]) > 0) & (np.asarray(out["bound"]) < 1))
        assert np.all((np.asarray(out["color"]) > 0) & (np.asarray(out["color"]) < 1))

    def test_train_mode_updates_batch_stats(self):
        ps = 64
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=False)
        variables, x = _init(model, ps)
        out, mutated = model.apply(
            variables, jnp.ones_like(x), train=True, mutable=["batch_stats"]
        )
        # running stats must actually change
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(not np.allclose(b, a) for b, a in zip(before, after))
        assert changed

    def test_14_channel_input(self):
        # Amazon workload: two-year 7-band stacks (amazon_py/main_tcc.py:31-38)
        ps = 64
        model = ResUnetA(num_classes=3, img_size=ps, multitasking=False)
        variables, x = _init(model, ps, in_ch=14)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, ps, ps, 3)

    def test_bfloat16_compute(self):
        ps = 64
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=True,
                         dtype=jnp.bfloat16)
        variables, x = _init(model, ps)
        out = model.apply(variables, jnp.ones_like(x), train=False)
        # heads cast back to f32 and stay finite
        assert out["seg"].dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(out["seg"])))


class TestUNet:
    def test_param_count(self):
        model = UNet(num_classes=5)
        variables, _ = _init(model, 64)
        assert _count(variables["params"]) == 3_523_173

    def test_output(self):
        model = UNet(num_classes=5)
        variables, x = _init(model, 64)
        out = model.apply(variables, jnp.ones_like(x))
        assert out.shape == (1, 64, 64, 5)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)


class TestDenseTail:
    """The dense-tail training path (final Combine -> PSPPooling -> heads on
    the lane-packed (N, H, W*C) view, RESUNETA_DENSE_TAIL) must produce the
    same outputs, loss, gradients, and parameter tree as the generic NHWC
    path. On CPU the head 3x3 segments take their NHWC fallback inside
    _dense_tail; the dense Combine/PSP/1x1 paths are pure jnp and run as-is."""

    def _run(self, monkeypatch, dense):
        mode = dense if isinstance(dense, str) else ("1" if dense else "0")
        monkeypatch.setenv("RESUNETA_DENSE_TAIL", mode)
        ps, nc = 64, 5
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, ps, ps, 3)), jnp.float32)
        model = ResUnetA(num_classes=nc, img_size=ps, multitasking=True,
                         dtype=jnp.float32)
        from resuneta_tpu.ops.pallas import convseg
        with convseg.disabled():  # eval-path init must not touch real kernels
            variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            l = sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out.values())
            return l, (out, upd["batch_stats"])

        (l, (out, stats)), g = jax.value_and_grad(loss, has_aux=True)(
            variables["params"])
        return l, out, g, stats

    def test_matches_generic_path(self, monkeypatch):
        l1, o1, g1, s1 = self._run(monkeypatch, True)
        l0, o0, g0, s0 = self._run(monkeypatch, False)
        for k in o0:
            np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o0[k]),
                                       rtol=2e-4, atol=2e-5, err_msg=k)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
        # gradients: identical math, different reduction order -> association
        # noise only. Bias gradients are cancellation-dominated sums over ~8k
        # summands of ~1e-2 magnitude; f32 reduction-tree differences produce
        # ~1e-3 ABSOLUTE noise there (measured same-code recompile-to-recompile
        # variation on CPU), hence the absolute tolerance.
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=2e-3)
        # BN running stats (incl. the dense-tail ConvBN sites) match
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_mode2_matches_generic_path(self, monkeypatch):
        """Mode 2 (dense combine+PSP, NHWC heads — the measured default):
        same outputs/loss/stats as the generic path."""
        l2, o2, g2, s2 = self._run(monkeypatch, "2")
        l0, o0, g0, s0 = self._run(monkeypatch, False)
        for k in o0:
            np.testing.assert_allclose(np.asarray(o2[k]), np.asarray(o0[k]),
                                       rtol=2e-4, atol=2e-5, err_msg=k)
        np.testing.assert_allclose(float(l2), float(l0), rtol=1e-4)
        for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(g0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=2e-3)
        for a, b in zip(jax.tree.leaves(s2), jax.tree.leaves(s0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_head_segments_wiring(self, monkeypatch):
        """Pin the head3 SEGMENT path (identity-affine fused segments) with a
        plain-jnp kernel substitute, as TestMixedDenseBlock does for blocks."""
        from resuneta_tpu.ops.pallas import convseg

        def jnp_seg_dense(width, dilation, eps, act, interpret, xd, gamma,
                          beta, mean, var, w, bias):
            N, H, L = xd.shape
            C = gamma.shape[0]
            a = gamma * jax.lax.rsqrt(var + eps)
            b = beta - mean * a
            z = xd.reshape(N, H, width, C).astype(jnp.float32) * a + b
            if act:
                z = jnp.maximum(z, 0)
            y = jax.lax.conv_general_dilated(
                z.astype(xd.dtype), w.astype(xd.dtype), (1, 1), "SAME",
                rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (y + bias.astype(xd.dtype)).reshape(N, H, L)

        def jnp_seg(dilation, eps, act, interpret, x, gamma, beta, mean, var,
                    w, bias):
            N, H, W, C = x.shape
            y = jnp_seg_dense(W, dilation, eps, act, interpret,
                              x.reshape(N, H, W * C), gamma, beta, mean, var,
                              w, bias)
            return y.reshape(N, H, W, C)

        monkeypatch.setattr(convseg, "fused_segment_dense", jnp_seg_dense)
        monkeypatch.setattr(convseg, "fused_segment", jnp_seg)
        # heads plannable, ResBlock branches not (isolates the tail wiring);
        # must still honor convseg.disabled() — _run inits the eval path
        monkeypatch.setattr(
            convseg, "pallas_available",
            lambda H, W, C, Co, d, bwd=True: not convseg._DISABLED_DEPTH
            and d == 1 and C == 32)
        l1, o1, g1, _ = self._run(monkeypatch, True)
        monkeypatch.setattr(convseg, "pallas_available",
                            lambda H, W, C, Co, d, bwd=True: False)
        l0, o0, g0, _ = self._run(monkeypatch, False)
        # outputs are the structural check (a mis-wired weight/ReLU shows up
        # at 1e-1 scale); gradients are NOT compared here — the monkeypatch
        # also reroutes every d=1 ResBlock branch, so deep-weight association
        # noise is not isolatable to the tail (kernel-level VJP parity lives
        # in tests/test_pallas_convseg.py, and test_matches_generic_path
        # covers the tail's gradients on unpatched kernels). Loss sanity only.
        for k in o0:
            np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o0[k]),
                                       rtol=2e-4, atol=2e-5, err_msg=k)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
        assert all(np.all(np.isfinite(np.asarray(g)))
                   for g in jax.tree.leaves(g1))


class TestDenseTrunk:
    """The whole-trunk dense training path (RESUNETA_DENSE_TRUNK: stem ->
    dense -> encoder ResBlocks + stride-2 downsample convs -> NHWC deep
    levels -> dense shallow decoder (conv-before-upsample UpSampleConv,
    concat-free Combine) -> dense tail) must produce the same outputs, loss,
    gradients, and parameter tree as the generic NHWC path. On CPU the 3x3
    segments take their NHWC fallbacks; the downsample/upsample/combine/1x1
    glue is pure jnp and runs as-is — exactly the math the TPU kernels pin."""

    def _run(self, monkeypatch, trunk, ps=64, multitasking=True):
        monkeypatch.setenv("RESUNETA_DENSE_TRUNK", "1" if trunk else "0")
        if not trunk:
            monkeypatch.setenv("RESUNETA_DENSE_TAIL", "0")
        nc = 5
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.standard_normal((2, ps, ps, 3)), jnp.float32)
        model = ResUnetA(num_classes=nc, img_size=ps,
                         multitasking=multitasking, dtype=jnp.float32)
        from resuneta_tpu.ops.pallas import convseg
        with convseg.disabled():
            variables = model.init(jax.random.PRNGKey(0), x, train=False)

        def loss(params):
            out, upd = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            if not isinstance(out, dict):
                out = {"seg": out}
            l = sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in out.values())
            return l, (out, upd["batch_stats"])

        (l, (out, stats)), g = jax.value_and_grad(loss, has_aux=True)(
            variables["params"])
        return l, out, g, stats, variables["params"]

    @staticmethod
    def _check_grads(g1, g0):
        """Global rel-l2 gradient gate, calibrated in float64: the trunk's
        reordered f32 BN-stat summations perturb activations at f32-eps scale,
        and this network amplifies a 1e-7 input perturbation into a 5.4e-5
        rel-l2 gradient change (measured); the f64 trunk-vs-generic gradient
        diff is 2.5e-4 rel-l2 — i.e. stacked rounding, not math (a real
        formula/VJP break measures O(1e-1)). Elementwise comparison is the
        wrong tool here: pre-BN conv biases have mathematically ~zero
        gradients, so leaf-relative diffs are noise-on-zero even between two
        runs of the SAME path."""
        du = np.concatenate([(np.asarray(a) - np.asarray(b)).ravel()
                             for a, b in zip(jax.tree.leaves(g1),
                                             jax.tree.leaves(g0))])
        nrm = np.concatenate([np.asarray(b).ravel()
                              for b in jax.tree.leaves(g0)])
        rel = np.linalg.norm(du) / np.linalg.norm(nrm)
        assert rel < 5e-3, rel

    def test_matches_generic_path(self, monkeypatch):
        l1, o1, g1, s1, p1 = self._run(monkeypatch, True)
        l0, o0, g0, s0, p0 = self._run(monkeypatch, False)
        # identical parameter trees (the dense trunk pins the same Flax names)
        assert jax.tree_util.tree_structure(p1) == \
            jax.tree_util.tree_structure(p0)
        for k in o0:
            np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o0[k]),
                                       rtol=2e-4, atol=2e-5, err_msg=k)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
        self._check_grads(g1, g0)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_singletask_matches_generic_path(self, monkeypatch):
        l1, o1, g1, s1, _ = self._run(monkeypatch, True, multitasking=False)
        l0, o0, g0, s0, _ = self._run(monkeypatch, False, multitasking=False)
        np.testing.assert_allclose(np.asarray(o1["seg"]),
                                   np.asarray(o0["seg"]), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
        self._check_grads(g1, g0)

    def test_psp_partial_downgrade_matches_materialized(self, monkeypatch):
        """PSP upsample-fold DOWNGRADE path (round 5): when the full
        (1,2,4,8) upsample set has no densemm VMEM plan, the largest k's are
        halved (a k=2 nearest-upsample materialized at the POOLED width)
        until a plan exists, instead of materializing full-res tensors. At
        W=128 the sequence naturally stops at (1,2,4,4,1) — this pins the
        downgraded fold against the fully-materialized jnp path (same
        params)."""
        import resuneta_tpu.models.resuneta as M
        from resuneta_tpu.ops.pallas import densemm

        cins = (8, 8, 8, 8, 32)
        assert not densemm.available(128, 128, cins, 32, (1, 2, 4, 8, 1),
                                     interpret=True)
        assert densemm.available(128, 128, cins, 32, (1, 2, 4, 4, 1),
                                 interpret=True)

        rng = np.random.default_rng(11)
        W = 128
        xn = jnp.asarray(rng.standard_normal((1, W, W, 32)) * 0.5,
                         jnp.float32)
        xd = xn.reshape(1, W, W * 32)
        # img_width=256 gates in all four pool levels {1,2,4,8}
        psp = M.PSPPooling(32, 256, dtype=jnp.float32)

        def run(fold):
            if fold:
                monkeypatch.setenv("RESUNETA_DENSEMM_INTERPRET", "1")
            else:
                monkeypatch.setenv("RESUNETA_NO_PALLAS_DENSEMM", "1")
            variables = psp.init(jax.random.PRNGKey(0), xd, train=True,
                                 dense_width=W)

            def loss(params):
                out, upd = psp.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    xd, train=True, dense_width=W, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2), (out, upd)

            (l, (out, upd)), g = jax.value_and_grad(loss, has_aux=True)(
                variables["params"])
            monkeypatch.delenv("RESUNETA_DENSEMM_INTERPRET", raising=False)
            monkeypatch.delenv("RESUNETA_NO_PALLAS_DENSEMM", raising=False)
            return l, out, g

        l1, o1, g1 = run(True)
        l0, o0, g0 = run(False)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o0),
                                   rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
        self._check_grads(g1, g0)

    def test_upsample_fold_matches_materialized(self, monkeypatch):
        """The wired ups-fold path (UpSampleConv deferring its x2 into
        Combine's matmul, PSP folding its level upsamples into the final
        projection — densemm kernels in interpret mode) must match the same
        dense trunk with every upsample materialized (the jnp fallback)."""
        monkeypatch.setenv("RESUNETA_DENSEMM_INTERPRET", "1")
        l1, o1, g1, s1, p1 = self._run(monkeypatch, True)
        monkeypatch.delenv("RESUNETA_DENSEMM_INTERPRET")
        l0, o0, g0, s0, p0 = self._run(monkeypatch, True)
        assert jax.tree_util.tree_structure(p1) == \
            jax.tree_util.tree_structure(p0)
        for k in o0:
            np.testing.assert_allclose(np.asarray(o1[k]), np.asarray(o0[k]),
                                       rtol=2e-4, atol=2e-5, err_msg=k)
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
        self._check_grads(g1, g0)
        for a, b in zip(jax.tree.leaves(s1), jax.tree.leaves(s0)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
