"""Tests: normalization, augmentation, patch extraction/reconstruction, morphology
— vs numpy/sklearn/scipy goldens and the reference's exact semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from resuneta_tpu.ops import (
    normalize_rgb,
    normalize_hsv,
    normalization,
    augment5,
    augment_by_index,
    extract_patches,
    extract_patches_nonoverlap,
    reconstruct_from_patches,
    morphology,
)


class TestNormalize:
    def test_type1(self):
        img = np.arange(48, dtype=np.float32).reshape(4, 4, 3)
        np.testing.assert_allclose(
            np.asarray(normalize_rgb(jnp.asarray(img), 1)), img / 255.0, rtol=1e-6
        )

    def test_type2_quirk(self):
        # reference computes img /= (127.5 - 1.) i.e. divide by 126.5 — NOT img/127.5-1
        img = np.full((2, 2, 3), 253.0, np.float32)
        out = np.asarray(normalize_rgb(jnp.asarray(img), 2))
        np.testing.assert_allclose(out, img / 126.5)

    def test_type3_standard_scaler(self):
        sklearn = pytest.importorskip("sklearn.preprocessing")
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, size=(16, 16, 3)).astype(np.float32)
        flat = img.reshape(-1, 3)
        golden = sklearn.StandardScaler().fit_transform(flat).reshape(img.shape)
        ours = np.asarray(normalize_rgb(jnp.asarray(img), 3))
        np.testing.assert_allclose(ours, golden, atol=1e-4)

    def test_normalization_minmax(self):
        rng = np.random.default_rng(1)
        img = rng.uniform(-5, 10, size=(8, 8, 4)).astype(np.float32)
        out = np.asarray(normalization(jnp.asarray(img), 2))
        assert out.min() >= -1e-6 and out.max() <= 1 + 1e-6
        out2 = np.asarray(normalization(jnp.asarray(img), 3))
        assert abs(out2.min() + 1) < 1e-5 and abs(out2.max() - 1) < 1e-5

    def test_hsv_channel_scales(self):
        img = np.ones((4, 4, 3), np.float32) * np.array([179.0, 255.0, 255.0])
        out = np.asarray(normalize_hsv(jnp.asarray(img), 1))
        np.testing.assert_allclose(out, 1.0, atol=1e-6)


class TestAugment:
    def test_matches_reference_variants(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (16, 16, 3), np.uint8)
        lbl = rng.integers(0, 5, (16, 16), np.uint8)
        imgs, lbls = augment5(jnp.asarray(img), jnp.asarray(lbl))
        imgs, lbls = np.asarray(imgs), np.asarray(lbls)
        # utils.py:69-95 — exactly 5 variants, NOT rot270
        np.testing.assert_array_equal(imgs[0], img)
        np.testing.assert_array_equal(imgs[1], np.rot90(img, 1))
        np.testing.assert_array_equal(imgs[2], np.rot90(img, 2))
        np.testing.assert_array_equal(imgs[3], np.flip(img, 0))
        np.testing.assert_array_equal(imgs[4], np.flip(img, 1))
        np.testing.assert_array_equal(lbls[1], np.rot90(lbl, 1))
        np.testing.assert_array_equal(lbls[4], np.flip(lbl, 1))

    def test_augment_by_index_jit(self):
        import jax

        rng = np.random.default_rng(1)
        img = rng.standard_normal((8, 8, 3)).astype(np.float32)
        f = jax.jit(augment_by_index)
        for j, golden in enumerate(
            [img, np.rot90(img), np.rot90(img, 2), np.flip(img, 0), np.flip(img, 1)]
        ):
            np.testing.assert_array_equal(np.asarray(f(img, j)), golden)


class TestPatches:
    def test_overlapping_matches_view_as_windows_semantics(self):
        rng = np.random.default_rng(0)
        img = rng.standard_normal((40, 56, 3)).astype(np.float32)
        ref = rng.integers(0, 5, (40, 56)).astype(np.uint8)
        patches, patches_ref = extract_patches(img, ref, patch_size=16, stride=8)
        n_r = (40 - 16) // 8 + 1
        n_c = (56 - 16) // 8 + 1
        assert patches.shape == (n_r * n_c, 16, 16, 3)
        assert patches_ref.shape == (n_r * n_c, 16, 16)
        # spot-check a middle patch (row-major ordering)
        k = 2 * n_c + 3
        np.testing.assert_array_equal(patches[k], img[16:32, 24:40])
        np.testing.assert_array_equal(patches_ref[k], ref[16:32, 24:40])

    def test_nonoverlap_roundtrip_row(self):
        rng = np.random.default_rng(1)
        img = rng.standard_normal((64, 96)).astype(np.float32)
        p = extract_patches_nonoverlap(img, 32, order="row")
        rec = reconstruct_from_patches(p, 64, 96, order="row")
        np.testing.assert_array_equal(np.asarray(rec), img)

    def test_nonoverlap_roundtrip_col(self):
        rng = np.random.default_rng(2)
        img = rng.standard_normal((64, 96, 3)).astype(np.float32)
        p = extract_patches_nonoverlap(img, 32, order="col")
        rec = reconstruct_from_patches(p, 64, 96, order="col")
        np.testing.assert_array_equal(np.asarray(rec), img)

    def test_col_order_matches_reference_loop(self):
        # utils.py:402-437 extrac_patch2: outer loop over columns
        img = np.arange(16 * 8, dtype=np.float32).reshape(16, 8)
        p = extract_patches_nonoverlap(img, 4, order="col")
        golden = []
        for i in range(8 // 4):
            for j in range(16 // 4):
                golden.append(img[4 * j:4 * (j + 1), 4 * i:4 * (i + 1)])
        np.testing.assert_array_equal(np.asarray(p), np.stack(golden))

    def test_device_extraction_matches_host(self):
        from resuneta_tpu.ops.patches import extract_patches_device

        rng = np.random.default_rng(3)
        img = rng.standard_normal((40, 40, 3)).astype(np.float32)
        ref = rng.integers(0, 2, (40, 40)).astype(np.uint8)
        host, _ = extract_patches(img, ref, 16, 8)
        dev = np.asarray(extract_patches_device(jnp.asarray(img), 16, 8))
        np.testing.assert_allclose(dev, host, atol=1e-6)


class TestMorphology:
    def test_disk_matches_skimage_formula(self):
        d2 = morphology.disk(2)
        golden = np.array(
            [
                [0, 0, 1, 0, 0],
                [0, 1, 1, 1, 0],
                [1, 1, 1, 1, 1],
                [0, 1, 1, 1, 0],
                [0, 0, 1, 0, 0],
            ],
            np.uint8,
        )
        np.testing.assert_array_equal(d2, golden)

    def test_dilation_disk(self):
        img = np.zeros((11, 11), np.uint8)
        img[5, 5] = 1
        out = morphology.dilation_disk(img, 2)
        np.testing.assert_array_equal(out[3:8, 3:8], morphology.disk(2))
        assert out.sum() == morphology.disk(2).sum()

    def test_mask_no_considered(self):
        ref = np.zeros((12, 12), np.uint8)
        ref[4:7, 4:7] = 1
        past = np.zeros_like(ref)
        past[0, 0] = 1
        out = morphology.mask_no_considered(ref, 2, past)
        assert out[5, 5] == 1            # current deforestation stays class 1
        assert out[2, 5] == 2            # buffer ring becomes class 2
        assert out[0, 0] == 2            # past deforestation forced to class 2
        assert out[11, 11] == 0

    def test_area_opening(self):
        img = np.zeros((20, 20), np.uint8)
        img[2:4, 2:4] = 1     # area 4 < 11 -> removed
        img[10:15, 10:15] = 1  # area 25 >= 11 -> kept
        out = morphology.area_opening(img, area_threshold=11, connectivity=1)
        assert out[3, 3] == 0
        assert out[12, 12] == 1
