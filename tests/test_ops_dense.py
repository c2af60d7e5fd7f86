"""Dense-layout glue ops (ops/dense.py) vs their NHWC equivalents."""

import numpy as np
import jax
import jax.numpy as jnp

from resuneta_tpu.ops import dense


def _rand(shape, seed=0, dtype=np.float32):
    return np.random.default_rng(seed).standard_normal(shape).astype(dtype)


class TestConv1x1:
    def test_matches_nhwc_conv(self):
        N, H, W, Cin, Cout = 2, 8, 16, 32, 24
        x = jnp.asarray(_rand((N, H, W, Cin)))
        k = jnp.asarray(_rand((1, 1, Cin, Cout), 1) * 0.1)
        b = jnp.asarray(_rand((Cout,), 2) * 0.1)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = dense.conv1x1(dense.to_dense(x), k, b, cin=Cin, cout=Cout,
                            dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(dense.to_nhwc(got, width=W, channels=Cout)),
            np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_cin_128_identity_kron(self):
        # g == 1: the kron block is the kernel itself
        N, H, W, Cin, Cout = 1, 4, 8, 128, 64
        x = jnp.asarray(_rand((N, H, W, Cin)))
        k = jnp.asarray(_rand((1, 1, Cin, Cout), 1) * 0.1)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = dense.conv1x1(dense.to_dense(x), k, None, cin=Cin, cout=Cout,
                            dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(dense.to_nhwc(got, width=W, channels=Cout)),
            np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestConcatConv:
    def test_concat_becomes_matmul_sum(self):
        N, H, W = 2, 8, 16
        cs = [8, 8, 32]
        Cout = 16
        xs = [jnp.asarray(_rand((N, H, W, c), i)) for i, c in enumerate(cs)]
        k = jnp.asarray(_rand((1, 1, sum(cs), Cout), 7) * 0.1)
        b = jnp.asarray(_rand((Cout,), 8) * 0.1)
        ref = jax.lax.conv_general_dilated(
            jnp.concatenate(xs, -1), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        got = dense.concat_conv1x1(
            [(dense.to_dense(x), c) for x, c in zip(xs, cs)], k, b,
            cout=Cout, dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(dense.to_nhwc(got, width=W, channels=Cout)),
            np.asarray(ref), rtol=1e-5, atol=1e-5)


class TestSpatial:
    def test_max_pool_matches_nn(self):
        import flax.linen as nn
        N, H, W, C = 2, 16, 16, 8
        x = jnp.asarray(_rand((N, H, W, C)))
        for k in (1, 2, 4, 8):
            ref = nn.max_pool(x, window_shape=(k, k), strides=(k, k))
            got = dense.max_pool(dense.to_dense(x), width=W, channels=C, k=k)
            np.testing.assert_array_equal(
                np.asarray(dense.to_nhwc(got, width=W // k, channels=C)),
                np.asarray(ref))

    def test_upsample_matches_repeat(self):
        N, Hp, Wp, C = 1, 4, 4, 8
        x = jnp.asarray(_rand((N, Hp, Wp, C)))
        for k in (1, 2, 4):
            ref = jnp.repeat(jnp.repeat(x, k, 1), k, 2)
            got = dense.upsample_nearest(dense.to_dense(x), width=Wp,
                                         channels=C, k=k)
            np.testing.assert_array_equal(
                np.asarray(dense.to_nhwc(got, width=Wp * k, channels=C)),
                np.asarray(ref))

    def test_downsample2_matches_stride2(self):
        N, H, W, C = 2, 8, 16, 32
        x = jnp.asarray(_rand((N, H, W, C)))
        ref = x[:, ::2, ::2]
        got = dense.downsample2(dense.to_dense(x), width=W, channels=C)
        np.testing.assert_array_equal(
            np.asarray(dense.to_nhwc(got, width=W // 2, channels=C)),
            np.asarray(ref))


class TestBN:
    def test_bn_apply_matches_channelwise(self):
        N, H, W, C = 2, 8, 8, 16
        x = jnp.asarray(_rand((N, H, W, C)))
        g = jnp.asarray(_rand((C,), 1) * 0.5 + 1)
        b = jnp.asarray(_rand((C,), 2) * 0.2)
        m = jnp.asarray(_rand((C,), 3) * 0.1)
        v = jnp.asarray(np.abs(_rand((C,), 4)) + 0.5)
        inv = jax.lax.rsqrt(v + 1e-3)
        ref = jnp.maximum((x - m) * inv * g + b, 0)
        got = dense.bn_apply(dense.to_dense(x), channels=C, gamma=g, beta=b,
                             mean=m, var=v, eps=1e-3, relu=True)
        np.testing.assert_allclose(
            np.asarray(dense.to_nhwc(got, width=W, channels=C)),
            np.asarray(ref), rtol=1e-5, atol=1e-6)
