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


class TestPredictSceneOverlap:
    """Overlap-averaged reconstruction (VERDICT round-1 item #10)."""

    def test_stride_equals_patch_matches_chop(self):
        from resuneta_tpu.infer.sliding import predict_scene_overlap
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(32, 48, 2)).astype(np.float32)
        f = jax.jit(_toy_apply)
        chop_map, _ = predict_scene(f, img, patch_size=16, batch_size=4,
                                    multitask=False)
        ov_map, mean = predict_scene_overlap(f, img, patch_size=16, stride=16,
                                             batch_size=4, multitask=False)
        np.testing.assert_array_equal(ov_map, chop_map)
        assert mean.shape == (32, 48, 3)

    def test_per_pixel_model_invariant_to_overlap(self):
        # a model whose output depends only on the pixel value: averaging
        # identical votes must not change anything at any stride
        from resuneta_tpu.infer.sliding import predict_scene_overlap
        rng = np.random.default_rng(1)
        img = rng.uniform(size=(48, 48, 2)).astype(np.float32)
        f = jax.jit(_toy_apply)
        chop_map, _ = predict_scene(f, img, patch_size=16, batch_size=8,
                                    multitask=False)
        ov_map, _ = predict_scene_overlap(f, img, patch_size=16, stride=8,
                                          batch_size=8, multitask=False)
        np.testing.assert_array_equal(ov_map, chop_map)

    def test_averaging_changes_only_window_boundary_pixels(self):
        # model = strong per-pixel signal + an artifact on each window's outer
        # ring that flips the argmax. The non-overlap chop keeps the artifact on
        # its grid seams; overlap averaging dilutes it wherever a pixel is
        # interior to at least one covering window. Differences between the two
        # reconstructions must therefore be (a) nonempty and (b) confined to
        # the chop grid's ring pixels.
        from resuneta_tpu.infer.sliding import predict_scene_overlap
        P = 16

        def apply_fn(x):
            m = jnp.clip(jnp.round(x[..., 0]), 0, 1)  # per-pixel class {0,1}
            logit0 = (1 - m) * 4.0
            logit1 = m * 4.0
            ii = jnp.arange(x.shape[1])
            ring_r = (ii == 0) | (ii == x.shape[1] - 1)
            ring = ring_r[None, :, None] | ring_r[None, None, :]
            logit2 = jnp.where(ring, 10.0, -10.0) * jnp.ones(x.shape[:-1])
            return jax.nn.softmax(
                jnp.stack([logit0, logit1, logit2], axis=-1), axis=-1)

        rng = np.random.default_rng(2)
        img = rng.uniform(size=(48, 64, 2)).astype(np.float32)
        f = jax.jit(apply_fn)
        chop_map, _ = predict_scene(f, img, patch_size=P, batch_size=8,
                                    multitask=False)
        # stride P/4: in the scene interior every pixel is covered by 4 windows
        # per axis and sits on the ring of at most one, so a ring vote never
        # outweighs the signal; on the chop grid it is the only vote
        ov_map, _ = predict_scene_overlap(f, img, patch_size=P, stride=P // 4,
                                          batch_size=8, multitask=False)

        ring_rows = np.zeros(48, bool)
        ring_rows[np.arange(48) % P == 0] = True
        ring_rows[np.arange(48) % P == P - 1] = True
        ring_cols = np.zeros(64, bool)
        ring_cols[np.arange(64) % P == 0] = True
        ring_cols[np.arange(64) % P == P - 1] = True
        chop_ring = ring_rows[:, None] | ring_cols[None, :]
        interior = np.zeros((48, 64), bool)
        interior[P:-P, P:-P] = True

        diff = (ov_map != chop_map) & interior
        assert diff.any(), "overlap averaging should repair seam artifacts"
        assert not np.any(diff & ~chop_ring), \
            "overlap averaging must only change window-boundary pixels"

    def test_mesh_path_matches_single_device(self):
        from resuneta_tpu.infer.sliding import predict_scene_overlap
        assert jax.device_count() >= 8
        mesh = make_mesh(8)
        rng = np.random.default_rng(3)
        img = rng.uniform(size=(32, 32, 2)).astype(np.float32)
        f = jax.jit(_toy_apply)
        single, mean1 = predict_scene_overlap(f, img, patch_size=16, stride=8,
                                              batch_size=8, multitask=False)
        sharded, mean2 = predict_scene_overlap(f, img, patch_size=16, stride=8,
                                               batch_size=8, mesh=mesh,
                                               multitask=False)
        np.testing.assert_array_equal(single, sharded)
        np.testing.assert_allclose(mean1, mean2, atol=1e-6)
