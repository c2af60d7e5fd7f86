"""Fused BN-affine->ReLU->dilated-conv Pallas segment (ops/pallas/convseg.py)
vs the unfused XLA composition, interpreter mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resuneta_tpu.ops.pallas import convseg


def _reference(x, a, b, w, bias, d, act):
    z = x * a.astype(x.dtype) + b.astype(x.dtype)
    if act:
        z = jnp.maximum(z, 0)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        z.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
        rhs_dilation=(d, d), dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    return (y + bias.astype(jnp.float32)).astype(x.dtype)


@pytest.mark.skipif(not convseg._PALLAS_OK, reason="pallas not importable")
class TestConvSeg:
    @pytest.mark.parametrize("d", [1, 3, 15])
    @pytest.mark.parametrize("act", [True, False])
    def test_matches_xla_composition(self, d, act):
        rng = np.random.default_rng(d)
        N, H, W, C, Co = 2, 64, 64, 8, 8
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.5 + 1
        b = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2
        w = jnp.asarray(rng.standard_normal((3, 3, C, Co)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(Co), jnp.float32) * 0.1

        ref = np.asarray(_reference(x, a, b, w, bias, d, act), np.float32)
        got = np.asarray(convseg.bn_act_conv_pallas(
            x, a, b, w, bias, dilation=d, act=act, interpret=True), np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
        # off-border interior must be extremely close (same bf16 taps, f32 acc)
        sl = slice(2 * d, -2 * d)
        np.testing.assert_allclose(got[:, sl, sl], ref[:, sl, sl],
                                   rtol=0.02, atol=0.02)

    @pytest.mark.parametrize("C,d", [(256, 1), (256, 3), (256, 15),
                                     (512, 1)])
    def test_wide_channels_forward(self, C, d):
        # C=256 forward-only tier at the eval path's RB(256) 32x32 geometry —
        # full-width (C, C) tap matmuls, no block-diagonal packing — and the
        # round-5 C=512 forward tier (bf16 tap storage) at RB(512) 16x16
        rng = np.random.default_rng(100 + C + d)
        N, H, W = 1, (32 if C == 256 else 16), (32 if C == 256 else 16)
        assert convseg._plan(H, W, C, d) is not None, "wide RB must plan"
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.5 + 1
        b = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        ref = np.asarray(_reference(x, a, b, w, bias, d, True), np.float32)
        got = np.asarray(convseg.bn_act_conv_pallas(
            x, a, b, w, bias, dilation=d, act=True, interpret=True),
            np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.25)
        sl = slice(2 * d, -2 * d) if 4 * d < H else slice(None)
        np.testing.assert_allclose(got[:, sl, sl], ref[:, sl, sl],
                                   rtol=0.02, atol=0.15)

    def test_wide_channels_availability_gates(self):
        # both fwd (eval) and bwd (train) admit C=256 but not 512 (tap buffer
        # alone exceeds the VMEM plan) — on non-TPU backends pallas_available
        # reports False, so probe the channel predicate via _plan + constants
        assert convseg.MAX_CHANNELS == 128
        assert convseg.MAX_CHANNELS_FWD == 512
        assert convseg.MAX_CHANNELS_BWD_WIDE == 256
        assert convseg._plan(32, 32, 256, 1) is not None
        # the backward budgets the extra wide dw accumulators and still plans
        # the RB(256) train geometries (256px H=32, Amazon 128px H=16, d=1/3)
        assert convseg._plan(32, 32, 256, 1, bwd=True) is not None
        assert convseg._plan(16, 16, 256, 3, bwd=True) is not None
        # round-5 wide-tier margins (bf16 taps + padded windows + honest
        # single-buffer slots): every 512px C=256 @ H=64 train geometry plans
        for d in (1, 3, 15):
            assert convseg._plan(64, 64, 256, d, bwd=True) is not None
        # ...and the C <= 128 plans are BYTE-IDENTICAL with/without bwd (the
        # hardware-calibrated tiers must not shift)
        for (H, W, C, d) in ((256, 256, 32, 31), (128, 128, 64, 15),
                             (64, 64, 128, 15), (512, 512, 32, 15)):
            assert convseg._plan(H, W, C, d) == convseg._plan(H, W, C, d,
                                                              bwd=True)
        # C=512: forward-only (bf16 taps fit a fwd plan; the backward's f32
        # dw accumulators alone blow the budget, so training self-rejects)
        assert convseg._plan(16, 16, 512, 1) is not None
        assert convseg._plan(16, 16, 512, 1, bwd=True) is None

    def test_fallback_tier_padded_single_buffer(self, monkeypatch):
        """Round-5 narrow-tier fallback (1024px lanes=32768 analog): when the
        calibrated double/single-buffer search finds nothing, the planner
        falls back to a single-slot, physically zero-padded window. Forced
        here at a small geometry by shrinking the budgets; numerics must
        match the XLA composition exactly like every other plan."""
        monkeypatch.setattr(convseg, "_VMEM_BUDGET", int(6.9e5))
        monkeypatch.setattr(convseg, "_VMEM_BUDGET_SINGLE", int(7.0e5))
        N, H, W, C, d = 1, 64, 64, 8, 3
        plan = convseg._plan(H, W, C, d)
        assert plan is not None and plan[1] == 1 and plan[3] > 0, plan
        rng = np.random.default_rng(21)
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.5 + 1
        b = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        ref = np.asarray(_reference(x, a, b, w, bias, d, True), np.float32)
        got = np.asarray(convseg.bn_act_conv_pallas(
            x, a, b, w, bias, dilation=d, act=True, interpret=True),
            np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)

    def test_large_dilation_border(self):
        # d comparable to tile: halo correctness at image borders
        rng = np.random.default_rng(9)
        N, H, W, C = 1, 64, 64, 8
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        a = jnp.ones(C, jnp.float32)
        b = jnp.zeros(C, jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
        bias = jnp.zeros(C, jnp.float32)
        d = 31
        ref = np.asarray(_reference(x, a, b, w, bias, d, True), np.float32)
        got = np.asarray(convseg.bn_act_conv_pallas(
            x, a, b, w, bias, dilation=d, act=True, interpret=True), np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)


@pytest.mark.skipif(not convseg._PALLAS_OK, reason="pallas not importable")
class TestFusedSegmentVJP:
    """fused_segment's one-kernel backward vs autodiff of the jnp composition."""

    def _compose(self, d, act, eps=1e-3):
        def f(x, gamma, beta, mean, var, w, bias):
            invstd = jax.lax.rsqrt(var + eps)
            a = gamma * invstd
            b = beta - mean * a
            z = x.astype(jnp.float32) * a + b
            if act:
                z = jnp.maximum(z, 0)
            dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                z.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1), "SAME",
                rhs_dilation=(d, d), dimension_numbers=dn)
            return y.astype(jnp.float32) + bias.astype(jnp.float32)
        return f

    @pytest.mark.parametrize("d", [1, 3])
    def test_grads_match_autodiff(self, d):
        rng = np.random.default_rng(d)
        N, H, W, C = 2, 32, 32, 8
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.4 + 1
        beta = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2
        mean = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        var = jnp.asarray(np.abs(rng.standard_normal(C)) + 0.5, jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        cot = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)

        ref = self._compose(d, True)

        def loss_ref(*args):
            return jnp.sum(ref(*args) * cot)

        def loss_fused(*args):
            y = convseg.fused_segment(d, 1e-3, True, True, *args)
            return jnp.sum(y.astype(jnp.float32) * cot)

        args = (x, gamma, beta, mean, var, w, bias)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        g_fus = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)

        names = ["dx", "dgamma", "dbeta", "dmean", "dvar", "dw", "dbias"]
        for name, r, f in zip(names, g_ref, g_fus):
            r, f = np.asarray(r, np.float32), np.asarray(f, np.float32)
            scale = max(np.abs(r).max(), 1e-3)
            np.testing.assert_allclose(f, r, rtol=0.06, atol=0.06 * scale,
                                       err_msg=name)

    @pytest.mark.parametrize("H,d", [
        (32, 1),   # 256px RB(256): aligned roll window, double-buffered
        (64, 1),   # 512px RB(256): the round-5 PADDED window bwd plan
        (64, 15),  # 512px RB(256) d=15: single-buffered aligned window
    ])
    def test_wide_channels_grads_match_autodiff(self, H, d):
        """C=256 training tier (MAX_CHANNELS_BWD_WIDE): full-width (C, C) dw
        accumulator blocks, no group folding — gradients must match autodiff
        of the unfused composition like the C<128 tier does. Parametrized
        over the window variants the round-5 planner emits (aligned/padded,
        double/single-buffered) at the 256px and 512px RB(256) geometries."""
        rng = np.random.default_rng(77)
        N, W, C = 1, H, 256
        x = jnp.asarray(rng.standard_normal((N, H, W, C)) * 0.5, jnp.float32)
        gamma = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2 + 1
        beta = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        mean = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.05
        var = jnp.asarray(np.abs(rng.standard_normal(C)) + 0.5, jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        cot = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)

        ref = self._compose(d, True)

        def loss_ref(*args):
            return jnp.sum(ref(*args) * cot)

        def loss_fused(*args):
            y = convseg.fused_segment(d, 1e-3, True, True, *args)
            return jnp.sum(y.astype(jnp.float32) * cot)

        args = (x, gamma, beta, mean, var, w, bias)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        g_fus = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
        names = ["dx", "dgamma", "dbeta", "dmean", "dvar", "dw", "dbias"]
        for name, r, f in zip(names, g_ref, g_fus):
            r, f = np.asarray(r, np.float32), np.asarray(f, np.float32)
            scale = max(np.abs(r).max(), 1e-3)
            np.testing.assert_allclose(f, r, rtol=0.06, atol=0.06 * scale,
                                       err_msg=name)

    @pytest.mark.parametrize("d", [1, 3])
    def test_bwdonly_hybrid_matches_autodiff(self, d):
        """fused_segment_bwdonly: XLA forward must equal the jnp composition
        exactly, and the Pallas one-pass backward must match autodiff."""
        rng = np.random.default_rng(10 + d)
        N, H, W, C = 2, 32, 32, 8
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        gamma = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.4 + 1
        beta = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2
        mean = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        var = jnp.asarray(np.abs(rng.standard_normal(C)) + 0.5, jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        cot = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        args = (x, gamma, beta, mean, var, w, bias)

        def ref(x, gamma, beta, mean, var, w, bias):
            # the hybrid fwd runs BN/ReLU in f32 and the conv in x.dtype
            # (f32 here), matching the model's unfused training path
            invstd = jax.lax.rsqrt(var + 1e-3)
            a = gamma * invstd
            b = beta - mean * a
            z = jnp.maximum(x.astype(jnp.float32) * a + b, 0).astype(x.dtype)
            y = jax.lax.conv_general_dilated(
                z, w.astype(x.dtype), (1, 1), "SAME", rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + bias.astype(x.dtype)

        y_ref = np.asarray(ref(*args), np.float32)
        y_hyb = np.asarray(
            convseg.fused_segment_bwdonly(d, 1e-3, True, True, *args),
            np.float32)
        np.testing.assert_allclose(y_hyb, y_ref, rtol=2e-5, atol=2e-5)

        def loss_ref(*a):
            return jnp.sum(ref(*a) * cot)

        def loss_hyb(*a):
            y = convseg.fused_segment_bwdonly(d, 1e-3, True, True, *a)
            return jnp.sum(y.astype(jnp.float32) * cot)

        g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
        g_hyb = jax.grad(loss_hyb, argnums=tuple(range(7)))(*args)
        names = ["dx", "dgamma", "dbeta", "dmean", "dvar", "dw", "dbias"]
        for name, r, f in zip(names, g_ref, g_hyb):
            r, f = np.asarray(r, np.float32), np.asarray(f, np.float32)
            scale = max(np.abs(r).max(), 1e-3)
            np.testing.assert_allclose(f, r, rtol=0.06, atol=0.06 * scale,
                                       err_msg=name)

    @pytest.mark.parametrize("d", [1, 3, 15, 31])
    def test_clamped_windows_match_xla(self, d):
        """H tall enough that windows fit inside the plane: the kernel runs
        with pad == 0 (clamped DMA starts + in-VMEM boundary realign, no
        physical zero-padding) and must still match the XLA composition at the
        image borders."""
        rng = np.random.default_rng(100 + d)
        N, H, W, C = 1, 256, 16, 8
        tile = convseg._plan_tile(H, W, C, d)
        assert tile is not None and tile + 2 * convseg._dup(d) <= H, \
            "shape no longer exercises the clamped-window path"
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.5 + 1
        b = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        ref = np.asarray(_reference(x, a, b, w, bias, d, True), np.float32)
        got = np.asarray(convseg.bn_act_conv_pallas(
            x, a, b, w, bias, dilation=d, act=True, interpret=True),
            np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)

    def test_window_alignment_invariant(self):
        """Every pad == 0 tile plan must carry a 16-row-aligned DMA window:
        the boundary realign rolls 16-bit windows on the i32 sublane-pair view
        and Mosaic's dynamic_rotate requires 8-aligned sublanes there. tile=8
        plans (only reachable at the 512px shallow levels, lanes = 16384)
        violated this before _win_pad rounded the window up — the 512px model
        could not even init on TPU."""
        for H in (32, 64, 128, 256, 512, 1024):
            for W, C in ((512, 32), (256, 64), (128, 128), (256, 32),
                         (128, 64), (64, 128), (64, 64), (16, 8)):
                for d in (1, 3, 5, 7, 15, 31):
                    tile = convseg._plan_tile(H, W, C, d)
                    if tile is None:
                        continue
                    win, pad = convseg._win_pad(H, tile, d)
                    assert pad > 0 or win % 16 == 0, (H, W, C, d, tile, win)
                    assert win >= tile + 2 * convseg._dup(d) or pad > 0

    def test_rounded_window_512px_geometry(self):
        """lanes = 16384 (the 512px first level) plans tile=8 whose natural
        window (40 rows) is NOT 16-aligned; the DMA window is rounded to 48
        and the extra rows must not perturb the result."""
        rng = np.random.default_rng(5)
        N, H, W, C, d = 1, 64, 512, 32, 15
        tile = convseg._plan_tile(H, W, C, d)
        win, pad = convseg._win_pad(H, tile, d)
        assert pad == 0 and win != tile + 2 * convseg._dup(d), \
            "shape no longer exercises the rounded-window path"
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.5 + 1
        b = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        ref = np.asarray(_reference(x, a, b, w, bias, d, True), np.float32)
        got = np.asarray(convseg.bn_act_conv_pallas(
            x, a, b, w, bias, dilation=d, act=True, interpret=True),
            np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)

    def test_single_buffer_tier_planner(self):
        """d=31 at lanes=16384 (the 512px shallow levels) exceeds the
        double-buffered VMEM budget by one window slot; the planner's second
        tier runs it with a single-buffered DMA window (exposed copy). Every
        other model-family geometry keeps the double-buffered plan, and the
        genuinely oversized 1024px first level stays unplanned."""
        assert convseg._plan(512, 512, 32, 31)[:2] == (8, 1)
        assert convseg._plan(256, 256, 64, 31)[:2] == (8, 1)
        assert convseg._plan(512, 512, 32, 15)[:2] == (8, 2)
        assert convseg._plan(1024, 1024, 32, 31) is None
        for H, W, C in ((256, 256, 32), (128, 128, 64), (64, 64, 128)):
            for d in (1, 3, 15, 31):
                p = convseg._plan(H, W, C, d)
                assert p is not None and p[1] == 2, (H, W, C, d, p)

    def test_single_buffer_window_geometry(self):
        """Forward parity on a REAL nbuf=1 plan (d=31, lanes=16384): each
        program copies and waits on its own window; numerics must be identical
        to the double-buffered schedule."""
        rng = np.random.default_rng(11)
        N, H, W, C, d = 1, 128, 512, 32, 31
        assert convseg._plan(H, W, C, d)[:2] == (8, 1), \
            "shape no longer exercises the single-buffer tier"
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.5 + 1
        b = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        ref = np.asarray(_reference(x, a, b, w, bias, d, True), np.float32)
        got = np.asarray(convseg.bn_act_conv_pallas(
            x, a, b, w, bias, dilation=d, act=True, interpret=True),
            np.float32)
        np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)

    def test_single_buffer_bwd_parity(self):
        """Backward kernel on the nbuf=1 plan vs autodiff of the unfused
        composition: dx and the folded weight-gradient tap blocks."""
        rng = np.random.default_rng(12)
        N, H, W, C, d = 1, 128, 512, 32, 31
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
        g = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        aa = jnp.ones(C, jnp.float32)
        bb = jnp.zeros(C, jnp.float32)
        mean = jnp.zeros(C, jnp.float32)
        inv = jnp.ones(C, jnp.float32)
        gq = 128 // C
        wblk = jnp.einsum("ab,ijcd->ijacbd", jnp.eye(gq, dtype=jnp.float32),
                          w.astype(jnp.float32)).reshape(3, 3, 128, 128)
        dx, dw, _ = convseg._segment_bwd_pallas(
            x, g, aa, bb, mean, inv, wblk, dilation=d, act=True,
            interpret=True)

        def f(x, w):
            z = jnp.maximum(x.astype(jnp.float32), 0).astype(jnp.bfloat16)
            y = jax.lax.conv_general_dilated(
                z, w.astype(jnp.bfloat16), (1, 1), "SAME",
                rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32) * g)

        gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx, np.float32),
                                   np.asarray(gx, np.float32),
                                   rtol=0.06, atol=0.06)
        dwf = np.asarray(dw).reshape(3, 3, gq, C, gq, C)
        dwc = sum(dwf[:, :, q, :, q, :] for q in range(gq))
        np.testing.assert_allclose(dwc, np.asarray(gw, np.float32),
                                   rtol=0.06, atol=0.3)

    def test_dense_view_matches_nhwc(self):
        rng = np.random.default_rng(7)
        N, H, W, C, d = 2, 256, 16, 8, 3
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        a = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.5 + 1
        b = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1
        nhwc = convseg.bn_act_conv_pallas(x, a, b, w, bias, dilation=d,
                                          act=True, interpret=True)
        dense = convseg.bn_act_conv_pallas_dense(
            x.reshape(N, H, W * C), a, b, w, bias, width=W, dilation=d,
            act=True, interpret=True)
        np.testing.assert_array_equal(np.asarray(nhwc, np.float32),
                                      np.asarray(dense, np.float32).reshape(
                                          N, H, W, C))

    def test_forward_matches_eval_kernel(self):
        rng = np.random.default_rng(0)
        N, H, W, C = 1, 32, 32, 8
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        gamma = jnp.ones(C, jnp.float32)
        beta = jnp.zeros(C, jnp.float32)
        mean = jnp.zeros(C, jnp.float32)
        var = jnp.ones(C, jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2, jnp.float32)
        bias = jnp.zeros(C, jnp.float32)
        y = convseg.fused_segment(3, 1e-3, True, True, x, gamma, beta, mean,
                                  var, w, bias)
        a, b, _ = convseg._affine(gamma, beta, mean, var, 1e-3)
        y2 = convseg.bn_act_conv_pallas(x, a, b, w, bias, dilation=3, act=True,
                                        interpret=True)
        np.testing.assert_array_equal(np.asarray(y, np.float32),
                                      np.asarray(y2, np.float32))


@pytest.mark.skipif(not convseg._PALLAS_OK, reason="pallas not importable")
class TestDenseSegmentChain:
    """The dense ResBlock composition (models/resuneta.py _dense_train):
    bn_stats on the dense view + two chained dense fused segments + residual
    add, vs the NHWC wrapper of the SAME kernels. Identical arithmetic (the
    NHWC wrapper delegates to the dense kernel), so forward and all gradients
    must agree to float-32 reduction noise — this pins the dense-view WIRING
    (reshapes, width bookkeeping, stats folding). Segment-vs-XLA numerics are
    covered by the single-segment tests above; an elementwise chain comparison
    against an XLA composition is meaningless through two ReLUs (bf16 rounding
    flips masks at z ~ 0)."""

    @pytest.mark.parametrize("d", [1, 15])
    def test_branch_matches_nhwc_autodiff(self, d):
        from resuneta_tpu.ops.fused_bn import bn_stats_dense

        rng = np.random.default_rng(40 + d)
        N, H, W, C = 1, 256, 16, 8
        eps = 1e-3
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        params = []
        for i in range(2):
            params += [
                jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.3 + 1,
                jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.2,
                jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.2,
                            jnp.float32),
                jnp.asarray(rng.standard_normal(C), jnp.float32) * 0.1,
            ]
        cot = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)

        def branch_nhwc(x, *p):
            g1, b1, w1, c1, g2, b2, w2, c2 = p
            m1, v1 = bn_stats_dense(x.reshape(N, H, W * C), C)
            h = convseg.fused_segment(d, eps, True, True, x,
                                      g1, b1, m1, v1, w1, c1)
            m2, v2 = bn_stats_dense(h.reshape(N, H, W * C), C)
            h = convseg.fused_segment(d, eps, True, True, h,
                                      g2, b2, m2, v2, w2, c2)
            return x + h

        def branch_dense(x, *p):
            g1, b1, w1, c1, g2, b2, w2, c2 = p
            xd = x.reshape(N, H, W * C)
            m1, v1 = bn_stats_dense(xd, C)
            h = convseg.fused_segment_dense(W, d, eps, True, True, xd,
                                            g1, b1, m1, v1, w1, c1)
            m2, v2 = bn_stats_dense(h, C)
            h = convseg.fused_segment_dense(W, d, eps, True, True, h,
                                            g2, b2, m2, v2, w2, c2)
            return (xd + h).reshape(N, H, W, C)

        y_ref = np.asarray(branch_nhwc(x, *params), np.float32)
        y_dns = np.asarray(branch_dense(x, *params), np.float32)
        np.testing.assert_array_equal(y_dns, y_ref)

        def loss(fn):
            return lambda *a: jnp.sum(fn(*a) * cot)

        g_ref = jax.grad(loss(branch_nhwc), argnums=tuple(range(9)))(
            x, *params)
        g_dns = jax.grad(loss(branch_dense), argnums=tuple(range(9)))(
            x, *params)
        for i, (r, f) in enumerate(zip(g_ref, g_dns)):
            r, f = np.asarray(r, np.float32), np.asarray(f, np.float32)
            # atol floor: conv-bias cotangents are ~1e-5 sums of +-1 noise and
            # XLA's reduction ORDER differs between the two upstream graphs
            np.testing.assert_allclose(f, r, rtol=1e-4, atol=1e-4,
                                       err_msg=f"arg {i}")


@pytest.mark.skipif(not convseg._PALLAS_OK, reason="pallas not importable")
class TestMixedDenseBlock:
    """ResBlockA's dense train path with a PARTIALLY plannable dilation set
    (the 512px case: d=31 has no VMEM tile plan at lanes=16384, the rest do).
    The unplannable branch must fall back to NHWC XLA inside the dense block,
    sharing the block statistics, and match the all-NHWC generic path.

    CPU cannot run the real kernels, so fused_segment{,_dense} are replaced by
    a plain-jnp implementation of the same math — the test pins the module
    WIRING (per-branch gating, dense reshapes, stats sharing, residual adds),
    not kernel numerics (covered above)."""

    def test_mixed_block_matches_generic(self, monkeypatch):
        from resuneta_tpu.models import resuneta as M

        def jnp_seg(dilation, eps, act, interpret, x, gamma, beta, mean, var,
                    w, bias):
            a = gamma * jax.lax.rsqrt(var + eps)
            b = beta - mean * a
            z = x.astype(jnp.float32) * a + b
            if act:
                z = jnp.maximum(z, 0)
            dn = jax.lax.conv_dimension_numbers(
                x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                z.astype(x.dtype), w.astype(x.dtype), (1, 1), "SAME",
                rhs_dilation=(dilation, dilation), dimension_numbers=dn)
            return y + bias.astype(x.dtype)

        def jnp_seg_dense(width, dilation, eps, act, interpret, xd, gamma,
                          beta, mean, var, w, bias):
            N, H, L = xd.shape
            C = gamma.shape[0]
            y = jnp_seg(dilation, eps, act, interpret,
                        xd.reshape(N, H, width, C), gamma, beta, mean, var,
                        w, bias)
            return y.reshape(N, H, L)

        monkeypatch.setattr(convseg, "fused_segment", jnp_seg)
        monkeypatch.setattr(convseg, "fused_segment_dense", jnp_seg_dense)
        monkeypatch.setenv("RESUNETA_FUSED_TRAIN_SEGMENT", "1")

        rng = np.random.default_rng(3)
        N, H, W, C = 1, 32, 32, 8
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        cot = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.float32)
        block = M.ResBlockA(C, [1, 3, 31], dtype=jnp.float32)
        variables = block.init(jax.random.PRNGKey(0), x, train=True)

        def run(avail):
            monkeypatch.setattr(convseg, "pallas_available", avail)

            def loss(params, x):
                y, _ = block.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(y * cot), y

            (l, y), g = jax.value_and_grad(loss, argnums=(0, 1),
                                           has_aux=True)(
                variables["params"], x)
            return np.asarray(y), l, g

        # mixed: d in {1, 3} plannable, d=31 not (the 512px situation)
        y_mix, l_mix, g_mix = run(
            lambda Hh, Ww, Cc, Co, d: d != 31)
        # all-NHWC generic path
        y_gen, l_gen, g_gen = run(
            lambda Hh, Ww, Cc, Co, d: False)

        np.testing.assert_allclose(y_mix, y_gen, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(float(l_mix), float(l_gen), rtol=5e-3,
                                   atol=1e-3)
        flat_m = jax.tree.leaves(g_mix)
        flat_g = jax.tree.leaves(g_gen)
        for a, b in zip(flat_m, flat_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-3)
