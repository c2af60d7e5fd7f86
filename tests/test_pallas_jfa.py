"""Pallas JFA kernel vs the lax implementation (interpreter mode on CPU) —
numerics must be identical (same algorithm, same int32 arithmetic)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from resuneta_tpu.ops.distance import distance_transform_edt
from resuneta_tpu.ops.pallas import jfa


@pytest.mark.skipif(not jfa._PALLAS_OK, reason="pallas not importable")
class TestPallasJFA:
    def test_matches_lax_impl_interpret(self):
        rng = np.random.default_rng(0)
        x = (rng.uniform(size=(6, 32, 32)) > 0.3).astype(np.int32)
        ref = np.stack([
            np.asarray(distance_transform_edt(jnp.asarray(p))) for p in x
        ])
        out = np.asarray(jfa.distance_transform_edt_pallas(
            jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_tiled_matches_lax_impl_interpret(self):
        """Row-tiled band-DMA flood (the >= 1024px path) must be bit-identical
        to the XLA implementation; tile=16 on 64px planes exercises multiple
        tiles + every step-size class (s >= H skipped, s >= tile, s < tile)."""
        rng = np.random.default_rng(1)
        x = (rng.uniform(size=(3, 64, 128)) > 0.3).astype(np.int32)
        ref = np.stack([
            np.asarray(distance_transform_edt(jnp.asarray(p))) for p in x
        ])
        out = np.asarray(jfa.distance_transform_edt_pallas_tiled(
            jnp.asarray(x), tile=16, interpret=True))
        np.testing.assert_array_equal(out, ref)

    @pytest.mark.slow
    def test_tiled_1024px_interpret(self):
        """The actual target size: one 1024x1024 plane, default tile."""
        rng = np.random.default_rng(2)
        x = (rng.uniform(size=(1, 1024, 1024)) > 0.5).astype(np.int32)
        ref = np.asarray(distance_transform_edt(jnp.asarray(x[0])))
        out = np.asarray(jfa.distance_transform_edt_pallas_tiled(
            jnp.asarray(x), interpret=True))
        np.testing.assert_array_equal(out[0], ref)

    def test_band_layout_aligned_dma_starts(self):
        """REGRESSION (round 5): band DMA row starts must be 8-sublane
        aligned — |di| = s < 8 bands fetch tile + 8 rows from the aligned
        floor and roll the remainder in VMEM. Unaligned starts crash the TPU
        toolchain's remote Mosaic compile helper (bisected on hardware:
        s=1 passes crashed, s>=8 compiled — BENCH_NOTES round 5)."""
        from resuneta_tpu.ops.pallas.jfa import _band_layout

        rems, wins, offs = _band_layout((-1, 0, 1), 128)
        assert rems == [7, 0, 1]
        assert wins == [136, 128, 136]
        assert offs == [0, 136, 264]
        for di, rem in zip((-1, 0, 1), rems):
            assert (di - rem) % 8 == 0  # the DMA start offset is aligned
        # aligned pass: no extra rows, no rolls
        assert _band_layout((-256, 0, 256), 128)[1] == [128, 128, 128]

    def test_tiled_under_vmap_interpret(self):
        """REGRESSION (VERDICT r4 #1): the fused train pipeline vmaps label
        generation over the batch, and jax.vmap's default pallas batching rule
        cannot lower this kernel's memory-space-ANY blocked operand on TPU.
        The custom_vmap rule must fold the mapped axis into the plane grid and
        reproduce the per-sample results exactly."""
        rng = np.random.default_rng(3)
        x = (rng.uniform(size=(2, 3, 64, 128)) > 0.3).astype(np.int32)
        ref = np.stack([
            np.asarray(jfa.distance_transform_edt_pallas_tiled(
                jnp.asarray(s), tile=16, interpret=True)) for s in x
        ])
        out = np.asarray(jax.vmap(
            lambda p: jfa.distance_transform_edt_pallas_tiled(
                p, tile=16, interpret=True))(jnp.asarray(x)))
        np.testing.assert_array_equal(out, ref)

    def test_vmap_folds_batch_into_plane_grid(self, monkeypatch):
        """Structural guarantee at the production 1024px pipeline shapes
        (B=2 samples x C=5 one-hot planes): tracing the vmapped kernel must
        reach the pallas implementation with the batch FOLDED into the plane
        axis — i.e. an unbatched (10, 1024, 1024) call, the exact program the
        unbatched tests pin — and never a batched pallas_call (which is what
        failed to lower on TPU in round 4)."""
        shapes = []
        orig = jfa._tiled_impl

        def record(planes, tile, interpret):
            shapes.append(tuple(planes.shape))
            return orig(planes, tile, interpret)

        monkeypatch.setattr(jfa, "_tiled_impl", record)
        jfa._tiled_vmapped.cache_clear()
        try:
            jax.make_jaxpr(jax.vmap(jfa.distance_transform_edt_pallas_tiled))(
                jnp.zeros((2, 5, 1024, 1024), jnp.int32))
        finally:
            jfa._tiled_vmapped.cache_clear()  # drop recorder-bound closures
        # custom_vmap also traces the UNBATCHED callee once to form its primal
        # jaxpr (the (5, H, W) entry — never lowered); the executed program is
        # the rule's folded (B*C, H, W) call, and nothing may ever see a
        # batched 4-D operand.
        assert shapes[-1] == (10, 1024, 1024)
        assert all(len(s) == 3 for s in shapes)

    def test_degenerate_planes_interpret(self):
        allzero = jnp.zeros((1, 16, 16), jnp.int32)
        out = np.asarray(jfa.distance_transform_edt_pallas(allzero, interpret=True))
        assert np.all(out == 0)
        allone = jnp.ones((1, 16, 16), jnp.int32)
        out1 = np.asarray(jfa.distance_transform_edt_pallas(allone, interpret=True))
        assert np.all(out1 > 100)  # huge sentinel, normalized away by callers
