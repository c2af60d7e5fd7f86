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
