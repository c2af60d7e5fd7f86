import numpy as np

from resuneta_tpu.data.legacy_utils import (
    extract_patches_mask_indices, get_patches_batch,
)
from resuneta_tpu.data.legacy_utils import test_model as _eval_model


def test_mask_indices():
    img = np.zeros((8, 8))
    out = extract_patches_mask_indices(img, 4, 2)
    assert out.shape == (9, 4, 4)
    np.testing.assert_array_equal(out[0], np.arange(64).reshape(8, 8)[:4, :4])
    np.testing.assert_array_equal(out[1], np.arange(64).reshape(8, 8)[:4, 2:6])


def test_patches_batch():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((16, 16, 3))
    out = get_patches_batch(img, [5, 8], [5, 8], radio=2, batch=2)
    assert out.shape == (2, 5, 5, 3)
    np.testing.assert_array_equal(out[0], img[3:8, 3:8])


def test_test_model():
    probs = np.array([[0.2, 0.8], [0.9, 0.1]])
    pred, true, p1 = _eval_model(None, np.array([1, 0]), lambda x: probs)
    np.testing.assert_array_equal(pred, [1, 0])
    np.testing.assert_array_equal(p1, [0.8, 0.1])


class TestDirectoryPairDataset:
    """DataGenerator_wqw parity (ResUnet_a/utils.py:20-66), incl. the cv2.resize
    to config dims at :50-52."""

    def _make_dirs(self, tmp_path, n=3, h=12, w=10, c=3):
        rng = np.random.default_rng(0)
        img_dir = tmp_path / "img"
        lbl_dir = tmp_path / "lbl"
        img_dir.mkdir()
        lbl_dir.mkdir()
        for i in range(n):
            np.save(img_dir / f"{i}.npy",
                    rng.uniform(0, 255, (h, w, c)).astype(np.float32))
            np.save(lbl_dir / f"{i}.npy", rng.integers(0, 2, (h, w)).astype(np.uint8))
        return str(img_dir), str(lbl_dir)

    def test_resize_matches_cv2(self, tmp_path):
        import cv2
        from resuneta_tpu.data.dataset import DirectoryPairDataset

        img_dir, lbl_dir = self._make_dirs(tmp_path)
        ds = DirectoryPairDataset(img_dir, lbl_dir, num_classes=2,
                                  target_size=(8, 8))
        batch = ds.get_batch([0, 1])
        assert batch["image"].shape == (2, 8, 8, 3)
        assert batch["seg"].shape == (2, 8, 8, 2)
        src = np.load(img_dir + "/0.npy")
        ref = cv2.resize(src, (8, 8))  # bilinear, (W, H) arg order like utils.py:50
        np.testing.assert_allclose(batch["image"][0], ref, rtol=1e-5, atol=1e-3)
        src_lbl = np.load(lbl_dir + "/0.npy")
        ref_lbl = cv2.resize(src_lbl, (8, 8), interpolation=cv2.INTER_NEAREST)
        np.testing.assert_array_equal(np.argmax(batch["seg"][0], -1), ref_lbl)

    def test_no_resize_and_mean(self, tmp_path):
        from resuneta_tpu.data.dataset import DirectoryPairDataset

        img_dir, lbl_dir = self._make_dirs(tmp_path)
        ds = DirectoryPairDataset(img_dir, lbl_dir, num_classes=2, mean=[1.0, 2.0, 3.0])
        batch = ds.get_batch([0])
        src = np.load(img_dir + "/0.npy")
        np.testing.assert_allclose(batch["image"][0], src - np.array([1, 2, 3], np.float32))
