"""Pallas Canny+dilate kernel vs the XLA implementation (interpreter mode)."""

import numpy as np
import jax.numpy as jnp
import jax
import pytest

from resuneta_tpu.ops.boundary import canny_binary, cross_dilate
from resuneta_tpu.ops.pallas import canny as pcanny


def _blobs(seed, h=32, w=32):
    rng = np.random.default_rng(seed)
    x = np.zeros((h, w), np.int32)
    for _ in range(4):
        r0, c0 = rng.integers(0, h - 6), rng.integers(0, w - 6)
        dh, dw = rng.integers(3, 12, 2)
        x[r0:min(r0 + dh, h), c0:min(c0 + dw, w)] = 1
    return x


@pytest.mark.skipif(not pcanny._PALLAS_OK, reason="pallas not importable")
class TestPallasCanny:
    def test_matches_xla_impl_interpret(self):
        planes = np.stack([_blobs(s) for s in range(6)])
        ref = np.stack([
            np.asarray(cross_dilate(canny_binary(jnp.asarray(p)))) for p in planes
        ])
        out = np.asarray(pcanny.boundary_label_pallas(
            jnp.asarray(planes), interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_degenerate_planes(self):
        flat = jnp.zeros((1, 16, 16), jnp.int32)
        out = np.asarray(pcanny.boundary_label_pallas(flat, interpret=True))
        assert np.all(out == 0)
