"""Training runtime tests: jitted steps, packed on-device pipeline, mesh data
parallelism on the virtual 8-device CPU mesh, checkpoint/resume, epoch loop."""

import os
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resuneta_tpu.models import ResUnetA, UNet
from resuneta_tpu.losses import make_losses
from resuneta_tpu.train import (
    TrainState, create_train_state, make_train_step, make_eval_step,
    METRICS_MULTITASK, METRICS_SINGLE, train_model, TrainConfig, checkpoint,
)
from resuneta_tpu.data import PackedDataset, make_device_pipeline
from resuneta_tpu.parallel import make_mesh, shard_batch

from util_synth import make_packed, synth_patches


def _unet_state(ps=32, num_classes=3, lr=1e-3):
    model = UNet(num_classes=num_classes, base_filters=8)
    return model, create_train_state(
        model, jax.random.PRNGKey(0), (1, ps, ps, 3), "adam", lr
    )


def _synth_float_batch(bs=4, ps=32, c=3, nc=3, seed=0):
    rng = np.random.default_rng(seed)
    img, ids = synth_patches(bs, ps, c, nc, seed)
    return {
        "image": img.astype(np.float32) / 255.0,
        "seg": np.eye(nc, dtype=np.float32)[ids],
    }


class TestSteps:
    def test_loss_decreases_single_task(self):
        model, state = _unet_state()
        losses = make_losses("cross_entropy")
        step = make_train_step(losses, {}, multitasking=False)
        batch = _synth_float_batch()
        first = None
        for i in range(12):
            state, row = step(state, batch)
            if first is None:
                first = float(row[0])
        assert float(row[0]) < first, "loss did not decrease"
        assert row.shape[0] == len(METRICS_SINGLE)

    def test_multitask_step_with_packed_pipeline(self, tmp_path):
        root = make_packed(tmp_path, n=4, ps=64, num_classes=5)
        ds = PackedDataset(root)
        model = ResUnetA(num_classes=5, img_size=64, multitasking=True)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
        pipe = make_device_pipeline(5, norm_type=1, multitasking=True)
        losses = make_losses("tanimoto")
        weights = {"seg": 1.0, "bound": 1.0, "dist": 1.0, "color": 1.0}
        step = make_train_step(losses, weights, multitasking=True, preprocess=pipe)
        raw = ds.get_batch(np.arange(2))
        state, row = step(state, raw)
        row = np.asarray(row)
        assert row.shape[0] == len(METRICS_MULTITASK)
        assert np.all(np.isfinite(row))
        # total = seg + bound + dist + color for unit weights
        np.testing.assert_allclose(row[0], row[1:5].sum(), rtol=1e-5)

    def test_eval_step_runs(self):
        model, state = _unet_state()
        losses = make_losses("cross_entropy")
        estep = make_eval_step(losses, {}, multitasking=False)
        row = np.asarray(estep(state, _synth_float_batch()))
        assert row.shape[0] == len(METRICS_SINGLE)
        assert np.all(np.isfinite(row))


class TestMesh:
    def test_eight_device_data_parallel(self):
        assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
        mesh = make_mesh(8)
        model, state = _unet_state()
        losses = make_losses("cross_entropy")
        step = make_train_step(losses, {}, multitasking=False, donate=False)
        batch = _synth_float_batch(bs=8)
        sharded = shard_batch(batch, mesh)
        state2, row = step(state, sharded)
        assert np.all(np.isfinite(np.asarray(row)))

    def test_sharded_matches_single_device(self):
        mesh = make_mesh(8)
        model, state = _unet_state()
        losses = make_losses("cross_entropy")
        step = make_train_step(losses, {}, multitasking=False, donate=False)
        batch = _synth_float_batch(bs=8)
        _, row_single = step(state, batch)
        _, row_sharded = step(state, shard_batch(batch, mesh))
        # GSPMD sync-BN + global-batch loss => same numerics either way
        np.testing.assert_allclose(
            np.asarray(row_single), np.asarray(row_sharded), rtol=2e-4, atol=1e-5
        )


class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        model, state = _unet_state()
        losses = make_losses("cross_entropy")
        step = make_train_step(losses, {}, multitasking=False)
        state, _ = step(state, _synth_float_batch())
        ckpt = str(tmp_path / "best_model.ckpt")
        checkpoint.save_best(ckpt, state, epoch=3, min_loss=0.5)

        _, fresh = _unet_state()
        restored, meta = checkpoint.restore(ckpt, fresh)
        assert meta["epoch"] == 3
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                        jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_lr_override_on_resume(self, tmp_path):
        model, state = _unet_state(lr=1e-3)
        ckpt = str(tmp_path / "c.ckpt")
        checkpoint.save_best(ckpt, state, 0, 1.0)
        _, fresh = _unet_state(lr=1e-3)
        restored, _ = checkpoint.restore(ckpt, fresh, learning_rate_override=5e-4)
        np.testing.assert_allclose(float(restored.learning_rate), 5e-4)


class TestLoop:
    def test_two_epochs_and_best_checkpoint(self, tmp_path):
        root = make_packed(tmp_path / "ds", n=8, ps=64, num_classes=3)
        ds = PackedDataset(root)
        train_ds = ds.subset(np.arange(0, 32))
        val_ds = ds.subset(np.arange(32, 40))

        model = UNet(num_classes=3, base_filters=8)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, 64, 64, 3))
        pipe = make_device_pipeline(3, norm_type=1, multitasking=False)
        losses = make_losses("cross_entropy")
        tstep = make_train_step(losses, {}, multitasking=False, preprocess=pipe)
        estep = make_eval_step(losses, {}, multitasking=False, preprocess=pipe)

        cfg = TrainConfig(results_path=str(tmp_path / "results"), batch_size=4,
                          epochs=2, multitasking=False, tensorboard=False,
                          verbose=False)
        state, history = train_model(cfg, state, tstep, estep, train_ds, val_ds)
        assert len(history) == 2
        assert "loss" in history[0]["train"]
        import os
        assert os.path.exists(str(tmp_path / "results" / "best_model.ckpt"))


class TestAsyncCheckpoint:
    def test_async_best_and_keep_last(self, tmp_path):
        import jax, jax.numpy as jnp
        from resuneta_tpu.models import UNet
        from resuneta_tpu.train import create_train_state, checkpoint

        model = UNet(num_classes=3, base_filters=4)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, 16, 16, 3),
                                   "adam", 1e-3)
        root = tmp_path / "ckpts"
        with checkpoint.AsyncSaver(keep_last=2) as saver:
            saver.save_best(str(tmp_path / "best.ckpt"), state, epoch=0,
                            min_loss=1.0)
            for e in range(4):
                saver.save_epoch(str(root), state, epoch=e)
            saver.wait()
        kept = sorted(d for d in os.listdir(root) if d.startswith("epoch_"))
        assert kept == ["epoch_2", "epoch_3"]
        # best checkpoint restores into a fresh state
        state2 = create_train_state(model, jax.random.PRNGKey(1), (1, 16, 16, 3),
                                    "adam", 1e-3)
        restored, meta = checkpoint.restore(str(tmp_path / "best.ckpt"), state2)
        assert meta["epoch"] == 0
        import numpy as np
        a = jax.tree_util.tree_leaves(state.params)[0]
        b = jax.tree_util.tree_leaves(restored.params)[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAsyncMetaOrdering:
    def test_meta_never_outruns_commit(self, tmp_path):
        """meta.json must only appear once the async checkpoint commit is
        drained (a crash mid-commit must not leave metadata pointing at no
        checkpoint)."""
        import jax
        from resuneta_tpu.models import UNet
        from resuneta_tpu.train import create_train_state, checkpoint

        model = UNet(num_classes=3, base_filters=4)
        state = create_train_state(model, jax.random.PRNGKey(0), (1, 16, 16, 3),
                                   "adam", 1e-3)
        saver = checkpoint.AsyncSaver()
        try:
            saver.save_best(str(tmp_path / "best.ckpt"), state, epoch=3,
                            min_loss=0.5)
            assert not os.path.exists(str(tmp_path / "best.ckpt.meta.json"))
            saver.wait()
            assert os.path.exists(str(tmp_path / "best.ckpt.meta.json"))
        finally:
            saver.close()
        _, meta = checkpoint.restore(str(tmp_path / "best.ckpt"), state)
        assert meta == {"epoch": 3, "min_val_loss": 0.5}


class TestLearning:
    def test_overfits_tiny_dataset(self):
        """End-to-end gradient sanity beyond parity tests: the full multitask
        model + losses + closed-form-VJP BN must overfit a 4-patch dataset
        (seg accuracy climbing far above chance). Catches sign/scale errors in
        any custom backward that per-op parity tolerances could let through."""
        import jax, jax.numpy as jnp
        from resuneta_tpu.models import ResUnetA
        from resuneta_tpu.losses import make_losses
        from resuneta_tpu.train import create_train_state, make_train_step
        from resuneta_tpu.data import make_device_pipeline

        ps, bs, nc = 64, 4, 5
        rng = np.random.default_rng(0)
        ids = rng.integers(0, nc, (bs, ps, ps)).astype(np.uint8)
        # image correlated with labels so the task is learnable
        img = (ids * (255 // (nc - 1))).astype(np.uint8)
        batch = {
            "image_u8": jnp.asarray(np.stack([img] * 3, -1)),
            "label_ids": jnp.asarray(ids),
            "aug": jnp.zeros(bs, jnp.int32),
        }
        model = ResUnetA(num_classes=nc, img_size=ps, multitasking=True,
                         dtype=jnp.float32)
        state = create_train_state(model, jax.random.PRNGKey(0),
                                   (1, ps, ps, 3), "adam", 1e-3)
        pipe = make_device_pipeline(nc, norm_type=1, multitasking=True)
        step = make_train_step(make_losses("tanimoto"),
                               {"seg": 1., "bound": 1., "dist": 1., "color": 1.},
                               multitasking=True, preprocess=pipe)
        accs = []
        for i in range(30):
            state, row = step(state, batch)
            accs.append(float(np.asarray(row)[5]))
        assert accs[-1] > 0.75, accs[-5:]
        assert accs[-1] > accs[0] + 0.3, (accs[0], accs[-1])

        # mIoU floor — the BASELINE.md quality-gate metric must be computable
        # from a trained model and must clear chance (~0.2/5-class) by a wide
        # margin on the overfit set. Train-mode forward (batch statistics): 30
        # steps move the momentum-0.99 running stats far too little for an
        # eval-mode check to be meaningful.
        from resuneta_tpu.metrics import mean_iou
        from resuneta_tpu.ops.normalize import normalize_rgb
        x = normalize_rgb(jnp.asarray(batch["image_u8"], jnp.float32), 1)
        out, _ = model.apply({"params": state.params,
                              "batch_stats": state.batch_stats}, x, train=True,
                             mutable=["batch_stats"])
        pred_ids = np.argmax(np.asarray(out["seg"]), axis=-1)
        miou, _ = mean_iou(np.asarray(batch["label_ids"]).ravel(),
                           pred_ids.ravel(), labels=list(range(nc)))
        assert miou > 0.5, miou


class TestTrajectoryPin:
    def test_cpu_f32_series_matches_pin(self):
        """The pinned REFERENCE_LOSSES (utils/trajectory.py) must stay exactly
        re-derivable from the production CPU/f32 step — bench.py checks the
        bf16 TPU step against this series, so a stale pin would turn
        `trajectory_ok` into noise."""
        from resuneta_tpu.utils import trajectory

        losses = trajectory.run_losses()
        np.testing.assert_allclose(losses, trajectory.REFERENCE_LOSSES,
                                   rtol=1e-4)
        assert trajectory.check(losses)
