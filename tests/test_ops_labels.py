"""Golden tests: boundary / distance / HSV label generation vs OpenCV,
the reference's exact backends (multitasking_utils.py:6-35,
preprocess_save_patches_ISPRS.py:223-228)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from resuneta_tpu.ops import (
    get_boundary_label,
    get_distance_label,
    rgb_to_hsv_cv2,
    hsv_to_rgb_cv2,
)
from resuneta_tpu.ops.boundary import canny_binary
from resuneta_tpu.ops.distance import distance_transform_edt


def _random_onehot(rng, h=64, w=64, c=5):
    ids = np.zeros((h, w), np.int32)
    # a few random rectangles and blobs per class
    for k in range(1, c):
        for _ in range(3):
            r0, c0 = rng.integers(0, h - 8), rng.integers(0, w - 8)
            dh, dw = rng.integers(3, 20), rng.integers(3, 20)
            ids[r0:min(r0 + dh, h), c0:min(c0 + dw, w)] = k
    onehot = np.eye(c, dtype=np.uint8)[ids]
    return onehot


def _ref_boundary(label_hwc):
    out = np.empty_like(label_hwc, dtype=np.float32)
    for ch in range(label_hwc.shape[2]):
        t = cv2.Canny(label_hwc[:, :, ch].astype(np.uint8), 0, 1)
        t = cv2.dilate(
            t, cv2.getStructuringElement(cv2.MORPH_CROSS, (3, 3)), iterations=1
        )
        out[:, :, ch] = t.astype(np.float32) / 255.0
    return out


def _ref_distance(label_hwc):
    out = np.empty_like(label_hwc, dtype=np.float32)
    for ch in range(label_hwc.shape[2]):
        patch = label_hwc[:, :, ch].astype(np.uint8)
        d = cv2.distanceTransform(patch, cv2.DIST_L2, 0)
        d = cv2.normalize(d, d, 0, 1.0, cv2.NORM_MINMAX)
        out[:, :, ch] = d
    return out


class TestCanny:
    def test_matches_cv2_on_random_blobs(self):
        rng = np.random.default_rng(0)
        mismatch_total = 0
        for seed in range(5):
            onehot = _random_onehot(np.random.default_rng(seed))
            for ch in range(onehot.shape[2]):
                golden = cv2.Canny(onehot[:, :, ch], 0, 1) / 255.0
                ours = np.asarray(canny_binary(jnp.asarray(onehot[:, :, ch])))
                mismatch_total += int(np.sum(golden != ours))
        # exact NMS parity is the goal; allow a tiny number of stray pixels
        assert mismatch_total <= 5, f"{mismatch_total} mismatching edge pixels"

    def test_boundary_label_after_dilation(self):
        for seed in range(4):
            onehot = _random_onehot(np.random.default_rng(seed))
            golden = _ref_boundary(onehot)
            ours = np.asarray(get_boundary_label(jnp.asarray(onehot)))
            agree = np.mean(golden == ours)
            assert agree > 0.999, f"agreement {agree}"


class TestDistance:
    def test_edt_exact_vs_cv2(self):
        for seed in range(4):
            onehot = _random_onehot(np.random.default_rng(seed))
            for ch in range(onehot.shape[2]):
                patch = onehot[:, :, ch].astype(np.uint8)
                golden = cv2.distanceTransform(patch, cv2.DIST_L2, 0)
                ours = np.asarray(distance_transform_edt(jnp.asarray(patch)))
                if patch.min() == 1:  # no zero seeds: cv2 returns a huge sentinel
                    continue
                np.testing.assert_allclose(ours, golden, atol=2e-3, rtol=1e-4)

    def test_distance_label_normalized(self):
        for seed in range(3):
            onehot = _random_onehot(np.random.default_rng(seed))
            golden = _ref_distance(onehot)
            ours = np.asarray(get_distance_label(jnp.asarray(onehot)))
            np.testing.assert_allclose(ours, golden, atol=5e-3)

    def test_degenerate_channels(self):
        allzero = jnp.zeros((32, 32, 1), jnp.uint8)
        assert np.all(np.asarray(get_distance_label(allzero)) == 0)
        allone = jnp.ones((32, 32, 1), jnp.uint8)
        assert np.all(np.asarray(get_distance_label(allone)) == 0)


class TestHSV:
    def test_rgb_to_hsv_matches_cv2(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
        golden = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
        ours = np.asarray(rgb_to_hsv_cv2(jnp.asarray(img)))
        # fixed-point emulation is bit-exact vs OpenCV
        np.testing.assert_array_equal(ours, golden)

    def test_arithmetic_division_matches_cv2_tables(self):
        # the device path computes OpenCV's sdiv/hdiv fixed-point tables
        # arithmetically (no gathers on TPU); must be exact for every 8-bit value
        from resuneta_tpu.ops.colorspace import (
            _SDIV, _HDIV, _HSV_SHIFT, _round_div_half_even)
        idx = jnp.arange(256, dtype=jnp.int32)
        sdiv = np.asarray(_round_div_half_even(255 << _HSV_SHIFT, idx))
        hdiv = np.asarray(_round_div_half_even((180 << _HSV_SHIFT) // 6, idx))
        np.testing.assert_array_equal(sdiv, _SDIV)
        np.testing.assert_array_equal(hdiv, _HDIV)

    def test_hsv_roundtrip(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        hsv = rgb_to_hsv_cv2(jnp.asarray(img))
        back = np.asarray(hsv_to_rgb_cv2(hsv))
        # uint8 HSV quantizes H to 2-degree steps; roundtrip error is bounded by
        # ~ c/30 per H step plus S rounding
        assert np.max(np.abs(back - img.astype(np.float32))) <= 12.0
