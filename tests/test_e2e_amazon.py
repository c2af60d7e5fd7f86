"""End-to-end Amazon workflow: synthetic two-year rasters -> preprocess CLI ->
train CLI (tile mode + preprocessed mode) -> eval CLI with threshold sweep."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def amazon_root(tmp_path_factory):
    """Synthetic Amazon_npy tree (CHW rasters, labels/*)."""
    root = tmp_path_factory.mktemp("amazon_npy")
    rng = np.random.default_rng(0)
    H, W, B = 160, 96, 2  # tiny: tiles are (32, 32)
    for name in ("t1", "t2"):
        np.save(root / f"{name}.npy",
                rng.standard_normal((B, H, W)).astype(np.float32))
    ref = np.zeros((H, W), np.uint8)
    # deforestation blobs in several tiles
    for r0, c0 in ((5, 5), (40, 40), (70, 10), (100, 60), (130, 30)):
        ref[r0:r0 + 12, c0:c0 + 12] = 1
    (root / "labels").mkdir()
    np.save(root / "labels" / "ref2019.npy", ref)
    past = np.zeros((H, W), np.uint8)
    past[0:4, 0:4] = 1
    np.save(root / "labels" / "past.npy", past)
    np.save(root / "mask_ref.npy", np.full((H, W), -1.0, np.float32))
    return root


def _common_args(root):
    return ["--dataset_path", str(root), "--image_t1", "t1.npy",
            "--image_t2", "t2.npy", "--reference", "labels/ref2019.npy",
            "--past_reference", "labels/past.npy", "--num_classes", "3"]


def _ps_args():
    return ["-ps", "32"]


class TestAmazonPreprocess:
    def test_preprocess_cli(self, amazon_root, tmp_path):
        from resuneta_tpu.cli.preprocess_amazon import main
        out = tmp_path / "ds"
        main(_common_args(amazon_root) + [
            "--patch_size", "32", "--stride", "16", "--def_percent", "2",
            "--mask_ref", "mask_ref.npy", "--output_path", str(out),
            "--train_tiles", "1", "4", "7", "--val_tiles", "11",
        ])
        manifest = json.load(open(out / "manifest.json"))
        assert manifest["channels"] == 4
        assert manifest["splits"]["train"]["num_patches"] > 0
        imgs = np.load(out / "train_images.npy")
        assert imgs.shape[1:] == (32, 32, 4)


class TestAmazonTrainEval:
    def test_train_tiles_and_eval(self, amazon_root, tmp_path):
        from resuneta_tpu.cli.train_amazon import main
        results = tmp_path / "run"
        state, history = main(_common_args(amazon_root) + _ps_args() + [
            "-rp", str(results), "-bs", "4", "--epochs", "1",
            "--stride", "16", "--percent", "2", "--area", "4",
            "--train_tiles", "1", "4", "7", "--val_tiles", "11",
            "--test_tiles", "2", "5",
        ])
        assert len(history) == 1
        assert os.path.isdir(results / "best_model.ckpt")
        assert os.path.exists(results / "prob_reconstructed.npy")

    def test_train_multitask_resuneta(self, tmp_path):
        """The main_mabel_resuneta.py capability (repaired): ResUnet-a with
        bound/dist heads on Amazon, labels derived on-device from the one-hot
        reference; no color head on multi-band input. Needs 64px patches (the
        ResUnet-a encoder bottoms out at H/32, so 32px has no PSP plane — the
        reference Keras graph has the same floor)."""
        from resuneta_tpu.cli.train_amazon import main
        # bigger scene: 5x3 tile grid of 64x64 tiles
        root = tmp_path / "amazon_big"
        (root / "labels").mkdir(parents=True)
        rng = np.random.default_rng(1)
        H, W = 320, 192
        for name in ("t1", "t2"):
            np.save(root / f"{name}.npy",
                    rng.standard_normal((2, H, W)).astype(np.float32))
        ref = np.zeros((H, W), np.uint8)
        for r0, c0 in ((10, 10), (80, 80), (150, 20), (210, 120), (270, 60)):
            ref[r0:r0 + 24, c0:c0 + 24] = 1
        np.save(root / "labels" / "ref2019.npy", ref)
        np.save(root / "labels" / "past.npy", np.zeros((H, W), np.uint8))

        results = tmp_path / "mabel"
        state, history = main(_common_args(root) + [
            "-ps", "64", "--resunet_a", "True", "--multitasking", "True",
            "-rp", str(results), "-bs", "4", "--epochs", "1",
            "--stride", "32", "--percent", "2", "--area", "4",
            "--train_tiles", "1", "4", "7", "--val_tiles", "11",
            "--test_tiles", "2", "5",
        ])
        assert len(history) == 1
        row = history[0]["val"]
        for k in ("seg_loss", "bound_loss", "dist_loss"):
            assert np.isfinite(row[k]), k
        assert row["color_loss"] == 0.0  # head deliberately absent
        assert os.path.exists(results / "prob_reconstructed.npy")

    def test_train_from_preprocessed_then_test_cli(self, amazon_root, tmp_path):
        from resuneta_tpu.cli.preprocess_amazon import main as prep
        from resuneta_tpu.cli.train_amazon import main as train
        from resuneta_tpu.cli.test_amazon import main as test

        ds = tmp_path / "ds"
        prep(_common_args(amazon_root) + [
            "--patch_size", "32", "--stride", "16", "--def_percent", "2",
            "--mask_ref", "mask_ref.npy", "--output_path", str(ds),
            "--train_tiles", "1", "4", "7", "--val_tiles", "11",
        ])
        results = tmp_path / "run2"
        train(_common_args(amazon_root) + _ps_args() + [
            "-rp", str(results), "-bs", "4", "--epochs", "1",
            "--preprocessed_path", str(ds),
        ])
        metrics, cm = test(_common_args(amazon_root) + _ps_args() + [
            "--model_path", str(results / "best_model.ckpt"),
            "--output_path", str(tmp_path / "preds"),
            "--area", "4", "--test_tiles", "2", "5",
            "--thresholds", "0.3", "0.5", "0.7",
        ])
        assert os.path.exists(tmp_path / "preds" / "prob_reconstructed.npy")
