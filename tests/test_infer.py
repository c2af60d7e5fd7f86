"""Sliding-window inference engine: batching/padding, mesh-sharded patch grid,
whole-scene reconstruction."""

import numpy as np
import jax
import jax.numpy as jnp

from resuneta_tpu.infer import predict_patches, predict_scene
from resuneta_tpu.parallel import make_mesh


def _toy_apply(x):
    # "model": class = round(mean of channel 0) -> {0,1}, 3-class softmax-ish
    m = jnp.clip(jnp.round(x[..., 0]), 0, 1)
    return jnp.stack([1 - m, m, jnp.zeros_like(m)], axis=-1)


class TestPredictPatches:
    def test_tail_padding(self):
        patches = np.random.default_rng(0).uniform(
            size=(10, 8, 8, 2)).astype(np.float32)
        out = predict_patches(jax.jit(_toy_apply), patches, batch_size=4)
        assert out.shape == (10, 8, 8, 3)

    def test_mesh_sharded_grid_matches_single(self):
        assert jax.device_count() >= 8
        mesh = make_mesh(8)
        patches = np.random.default_rng(1).uniform(
            size=(19, 8, 8, 2)).astype(np.float32)
        f = jax.jit(_toy_apply)
        single = predict_patches(f, patches, batch_size=8)
        sharded = predict_patches(f, patches, batch_size=8, mesh=mesh)
        np.testing.assert_allclose(single, sharded, atol=1e-6)

    def test_multitask_dict_outputs(self):
        def apply_fn(x):
            m = jnp.zeros(x.shape[:-1])
            return {"seg": jnp.stack([m + 1, m], -1), "color": x[..., :1]}

        patches = np.zeros((5, 4, 4, 2), np.float32)
        out = predict_patches(jax.jit(apply_fn), patches, batch_size=2)
        assert out["seg"].shape == (5, 4, 4, 2)
        assert out["color"].shape == (5, 4, 4, 1)


class TestPredictScene:
    def test_scene_roundtrip(self):
        img = np.zeros((32, 48, 2), np.float32)
        img[:16, :, 0] = 1.0
        class_map, preds = predict_scene(jax.jit(_toy_apply), img, patch_size=16,
                                         batch_size=4, multitask=False)
        assert class_map.shape == (32, 48)
        assert class_map[:16].min() == 1 and class_map[16:].max() == 0
