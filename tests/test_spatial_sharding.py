"""Spatial (data x space) GSPMD sharding: the train step compiles and matches
single-device numerics when activations are sharded over batch AND height."""

import numpy as np
import jax
import pytest

from resuneta_tpu.models import UNet
from resuneta_tpu.losses import make_losses
from resuneta_tpu.train import create_train_state, make_train_step
from resuneta_tpu.parallel import make_mesh_2d, shard_batch_spatial

from util_synth import synth_patches


class TestSpatialSharding:
    def test_dp_sp_step_matches_unsharded(self):
        assert jax.device_count() >= 8
        mesh = make_mesh_2d(4, 2)  # 4-way data, 2-way spatial

        model = UNet(num_classes=3, base_filters=8)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, 32, 32, 3))
        losses = make_losses("cross_entropy")
        step = make_train_step(losses, {}, multitasking=False, donate=False)

        img, ids = synth_patches(8, 32, 3, 3, seed=0)
        batch = {
            "image": img.astype(np.float32) / 255.0,
            "seg": np.eye(3, dtype=np.float32)[ids],
        }
        _, row_ref = step(state, batch)
        sharded = shard_batch_spatial(batch, mesh)
        _, row_sp = step(state, sharded)
        np.testing.assert_allclose(np.asarray(row_ref), np.asarray(row_sp),
                                   rtol=2e-4, atol=1e-5)

    def test_resuneta_multitask_dp_sp_matches_unsharded(self):
        """Production-model parity under height sharding: the d={1,3,15,31}
        dilated convs (ResUnet_a/model2.py:19-24) force halo exchange across the
        'space' axis — this pins that GSPMD handles them exactly, independently
        of the driver dryrun."""
        from resuneta_tpu.models import ResUnetA
        from resuneta_tpu.data import make_device_pipeline

        assert jax.device_count() >= 8
        mesh = make_mesh_2d(4, 2)

        model = ResUnetA(num_classes=5, img_size=64, multitasking=True)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
        losses = make_losses("tanimoto")
        weights = {"seg": 1.0, "bound": 1.0, "dist": 1.0, "color": 1.0}
        pipeline = make_device_pipeline(5, norm_type=1, multitasking=True)
        step = make_train_step(losses, weights, multitasking=True,
                               preprocess=pipeline, donate=False)

        rng = np.random.default_rng(3)
        batch = {
            "image_u8": rng.integers(0, 256, (8, 64, 64, 3), dtype=np.uint8),
            "label_ids": rng.integers(0, 5, (8, 64, 64)).astype(np.uint8),
            "aug": rng.integers(0, 5, 8).astype(np.int32),
        }
        _, row_ref = step(state, batch)
        sharded = shard_batch_spatial(batch, mesh)
        _, row_sp = step(state, sharded)
        np.testing.assert_allclose(np.asarray(row_ref), np.asarray(row_sp),
                                   rtol=2e-4, atol=1e-5)
