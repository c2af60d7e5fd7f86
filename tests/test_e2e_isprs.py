"""End-to-end CLI test: synthetic ISPRS scene -> preprocess (packed + legacy) ->
train 2 epochs -> test/eval with reconstruction, via the real CLI mains
(the reference workflow README.md:5-21: preprocess -> train -> test)."""

import json
import os

import numpy as np
import pytest

from util_synth import synth_scene
from resuneta_tpu.data.isprs import LABEL_DICT, class_ids_to_rgb


@pytest.fixture(scope="module")
def isprs_root(tmp_path_factory):
    """Synthetic Image_Train/Reference_Train/Image_Test/Reference_Test npys (CHW)."""
    root = tmp_path_factory.mktemp("isprs_npy")
    for split, seed in (("Train", 0), ("Test", 1)):
        image, ids = synth_scene(height=128, width=192, seed=seed)
        ref_rgb = class_ids_to_rgb(ids, LABEL_DICT)
        np.save(root / f"Image_{split}.npy", image.transpose(2, 0, 1))
        np.save(root / f"Reference_{split}.npy", ref_rgb.transpose(2, 0, 1))
    return root


class TestPreprocessCLI:
    def test_packed_output(self, isprs_root, tmp_path):
        from resuneta_tpu.cli.preprocess_isprs import main
        out = tmp_path / "packed"
        main(["--patch_size", "64", "--stride", "64", "--num_classes", "5",
              "--dataset_path", str(isprs_root), "--output_path", str(out)])
        meta = json.load(open(out / "manifest.json"))
        assert meta["format"] == "packed-v1"
        imgs = np.load(out / "images.npy")
        lbls = np.load(out / "labels.npy")
        assert imgs.dtype == np.uint8 and lbls.dtype == np.uint8
        assert imgs.shape == (2 * 3, 64, 64, 3)
        assert set(np.unique(lbls)) <= set(range(5))

    def test_legacy_layout_matches_reference_contract(self, isprs_root, tmp_path):
        from resuneta_tpu.cli.preprocess_isprs import main
        out = tmp_path / "legacy"
        main(["--patch_size", "64", "--stride", "64",
              "--dataset_path", str(isprs_root), "--output_path", str(out),
              "--layout", "legacy"])
        names = sorted(os.listdir(out / "train"))
        assert len(names) == 2 * 3 * 5  # x5 augmentation
        assert "patch_0.npy" in names
        img = np.load(out / "train" / "patch_0.npy")
        assert img.dtype == np.float32 and img.shape == (64, 64, 3)
        assert img.max() <= 1.0  # norm_type 1
        for head, ch in (("seg", 5), ("bound", 5), ("dist", 5), ("color", 3)):
            arr = np.load(out / "labels" / head / "patch_0.npy")
            assert arr.shape == (64, 64, ch), head
            assert arr.dtype == np.float32


@pytest.fixture(scope="module")
def packed_ds(isprs_root, tmp_path_factory):
    from resuneta_tpu.cli.preprocess_isprs import main
    out = tmp_path_factory.mktemp("ds") / "packed"
    main(["--patch_size", "64", "--stride", "32", "--num_classes", "5",
          "--dataset_path", str(isprs_root), "--output_path", str(out)])
    return out


class TestTrainEvalCLI:
    def test_train_unet_then_eval(self, isprs_root, packed_ds, tmp_path):
        from resuneta_tpu.cli.train_isprs import main as train_main
        results = tmp_path / "results"
        state, history = train_main([
            "--resunet_a", "False", "--multitasking", "False",
            "-dp", str(packed_ds), "-rp", str(results),
            "-bs", "4", "-lr", "1e-3", "--loss", "cross_entropy",
            "--num_classes", "5", "--epochs", "2", "-ps", "64",
        ])
        assert len(history) >= 1
        assert os.path.isdir(results / "best_model.ckpt")
        # TB event files written with the reference tag layout
        assert os.path.isdir(results / "logs" / "train")

    def test_train_gpu_parallel_mesh(self, packed_ds, tmp_path):
        # --gpu_parallel maps to the GSPMD data-parallel mesh (8 CPU devices here)
        from resuneta_tpu.cli.train_isprs import main as train_main
        results = tmp_path / "dp"
        state, history = train_main([
            "--resunet_a", "False", "--multitasking", "False",
            "--gpu_parallel", "True",
            "-dp", str(packed_ds), "-rp", str(results),
            "-bs", "8", "--loss", "cross_entropy", "--epochs", "1", "-ps", "64",
        ])
        assert len(history) == 1
        assert np.isfinite(history[0]["val"]["loss"])

    def test_train_resume_with_lr_override(self, packed_ds, tmp_path):
        from resuneta_tpu.cli.train_isprs import main as train_main
        results = tmp_path / "res1"
        train_main(["--resunet_a", "False", "--multitasking", "False",
                    "-dp", str(packed_ds), "-rp", str(results), "-bs", "4",
                    "--loss", "cross_entropy", "--epochs", "1", "-ps", "64"])
        results2 = tmp_path / "res2"
        state, _ = train_main([
            "--resunet_a", "False", "--multitasking", "False",
            "-dp", str(packed_ds), "-rp", str(results2), "-bs", "4",
            "--loss", "cross_entropy", "--epochs", "1", "-ps", "64",
            "-cp", str(results / "best_model.ckpt"), "-lr", "5e-4",
        ])
        np.testing.assert_allclose(float(state.learning_rate), 5e-4)
