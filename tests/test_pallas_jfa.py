"""Pallas JFA kernel vs the lax implementation (interpreter mode on CPU) —
numerics must be identical (same algorithm, same int32 arithmetic)."""

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

    def test_degenerate_planes_interpret(self):
        allzero = jnp.zeros((1, 16, 16), jnp.int32)
        out = np.asarray(jfa.distance_transform_edt_pallas(allzero, interpret=True))
        assert np.all(out == 0)
        allone = jnp.ones((1, 16, 16), jnp.int32)
        out1 = np.asarray(jfa.distance_transform_edt_pallas(allone, interpret=True))
        assert np.all(out1 > 100)  # huge sentinel, normalized away by callers
