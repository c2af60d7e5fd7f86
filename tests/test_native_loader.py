"""Native C++ batch loader: parity vs np.load and fancy indexing, and its wiring
into the datasets."""

import numpy as np
import pytest

from resuneta_tpu.data import native_loader


@pytest.fixture(scope="module")
def lib():
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("native loader unavailable (no g++?)")
    return lib


class TestNative:
    def test_load_npy_batch_parity(self, lib, tmp_path):
        rng = np.random.default_rng(0)
        paths, arrays = [], []
        for i in range(16):
            a = rng.standard_normal((32, 32, 5)).astype(np.float32)
            p = str(tmp_path / f"patch_{i}.npy")
            np.save(p, a)
            paths.append(p)
            arrays.append(a)
        out = native_loader.load_npy_batch(paths, (32, 32, 5), np.float32)
        assert out is not None
        np.testing.assert_array_equal(out, np.stack(arrays))

    def test_load_rejects_wrong_shape(self, lib, tmp_path):
        p = str(tmp_path / "bad.npy")
        np.save(p, np.zeros((4, 4), np.float32))
        out = native_loader.load_npy_batch([p], (8, 8), np.float32)
        assert out is None  # size mismatch -> caller falls back

    def test_gather_rows_parity(self, lib):
        rng = np.random.default_rng(1)
        src = rng.integers(0, 255, (100, 16, 16, 3), np.uint8)
        idx = rng.integers(0, 100, 32)
        out = native_loader.gather_rows(src, idx)
        np.testing.assert_array_equal(out, src[idx])

    def test_gather_rows_memmap(self, lib, tmp_path):
        rng = np.random.default_rng(2)
        src = rng.standard_normal((50, 8, 8)).astype(np.float32)
        p = str(tmp_path / "m.npy")
        np.save(p, src)
        mm = np.load(p, mmap_mode="r")
        idx = rng.integers(0, 50, 16)
        out = native_loader.gather_rows(mm, idx)
        np.testing.assert_array_equal(out, src[idx])


class TestDatasetWiring:
    def test_packed_dataset_uses_gather(self, tmp_path):
        import sys
        sys.path.insert(0, str(tmp_path))  # no-op, keep imports happy
        from util_synth import make_packed
        from resuneta_tpu.data import PackedDataset

        root = make_packed(tmp_path / "ds", n=6, ps=16, num_classes=3)
        ds = PackedDataset(root)
        raw = ds.get_batch(np.array([0, 7, 12]))
        assert raw["image_u8"].shape == (3, 16, 16, 3)
        # sample 7 = patch 1 variant 2; sample 12 = patch 2 variant 2
        np.testing.assert_array_equal(raw["label_ids"][1], ds.labels[1])
        np.testing.assert_array_equal(raw["aug"], [0, 2, 2])

    def test_legacy_dataset_native_path(self, tmp_path):
        from resuneta_tpu.data import LegacyPatchDataset

        rng = np.random.default_rng(3)
        for sub in ("train", "labels/seg"):
            (tmp_path / sub).mkdir(parents=True)
        arrays = {}
        for i in range(6):
            img = rng.standard_normal((16, 16, 3)).astype(np.float32)
            seg = rng.standard_normal((16, 16, 5)).astype(np.float32)
            np.save(tmp_path / "train" / f"patch_{i}.npy", img)
            np.save(tmp_path / "labels/seg" / f"patch_{i}.npy", seg)
            arrays[i] = (img, seg)
        ds = LegacyPatchDataset(str(tmp_path), multitasking=False)
        batch = ds.get_batch([0, 3, 5])
        np.testing.assert_array_equal(batch["image"][1], arrays[3][0])
        np.testing.assert_array_equal(batch["seg"][2], arrays[5][1])
