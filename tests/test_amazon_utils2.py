"""utils2.py-family helpers: right-region extraction, no-overlap valid patches,
augment-all/filtered balancing, tile stats, prediction variants, threshold sweep."""

import numpy as np
import pytest

from resuneta_tpu.data.amazon import (
    extract_patches_right_region, extract_patches_right_region_prediction,
    patches_with_out_overlap, patch_tiles_prediction, patch_tiles3,
    bal_aug_patches2, bal_aug_patches3, make_tile_mask,
)
from resuneta_tpu.infer.amazon import (
    output_prediction_FC, prediction2, matrics_AA_recall,
)


def _fake_apply(x):
    p1 = (np.asarray(x)[..., 0] > 0).astype(np.float32)
    return np.stack([1 - p1, p1, np.zeros_like(p1)], axis=-1)


class TestRightRegion:
    def test_percent_and_valid_filters(self):
        img = np.zeros((32, 32, 2), np.float32)
        ref = np.zeros((32, 32), np.int32)
        ref[0:8, 0:8] = 1
        mask = np.full((32, 32), -1.0)
        p, r = extract_patches_right_region(img, ref, mask, 16, 16, percent=5)
        assert len(p) == 1  # only the top-left patch has >= 5% class 1
        mask[0, 0] = 0  # invalidate one pixel of that patch
        p2, _ = extract_patches_right_region(img, ref, mask, 16, 16, percent=5)
        assert len(p2) == 0

    def test_prediction_variant_keeps_valid_only(self):
        img = np.zeros((32, 32, 2), np.float32)
        ref = np.zeros((32, 32), np.float64)
        ref[16:, :] = -1  # bottom half invalid
        p, r, _, _ = extract_patches_right_region_prediction(
            img, ref, None, None, 16, 16)
        assert len(p) == 2  # only the two top patches

    def test_patches_with_out_overlap_order_and_filter(self):
        img = np.arange(32 * 16, dtype=np.float64).reshape(32, 16)
        ref = np.zeros((32, 16))
        ref[16:, 8:] = -1
        out = patches_with_out_overlap(img, 16, 1, ref)
        assert out.shape == (1, 16, 16)  # 3 of 4... wait grid is 2x1 -> 2 patches
        # grid: w//16=1 col, h//16=2 rows; bottom patch contains -1 -> dropped
        np.testing.assert_array_equal(out[0], img[:16, :16])


class TestBalancers:
    def test_bal_aug_patches2_augments_all(self):
        imgs = np.zeros((3, 8, 8, 2), np.float32)
        refs = np.zeros((3, 8, 8), np.float32)
        p, r = bal_aug_patches2(5, 8, imgs, refs)
        assert len(p) == 15

    def test_bal_aug_patches3_filters_invalid(self):
        imgs = np.zeros((2, 8, 8, 2), np.float32)
        refs = np.zeros((2, 8, 8), np.float32)
        refs[0, :4] = 1          # 50% class 1, valid
        refs[1, :4] = 1
        refs[1, 7, 7] = -1       # invalid pixel -> dropped
        p, r = bal_aug_patches3(5, 8, imgs, refs)
        assert len(p) == 5


class TestTileHelpers:
    def test_patch_tiles_prediction(self):
        m = make_tile_mask(32, 32, rows=2, cols=2)
        img = np.random.default_rng(0).standard_normal((32, 32, 3)).astype(np.float32)
        ref = np.zeros((32, 32))
        p, r = patch_tiles_prediction([1, 4], m, img, ref, None, 16, 16)
        assert p.shape == (2, 16, 16, 3)
        assert r.shape == (2, 16, 16)

    def test_patch_tiles3_stats(self):
        m = make_tile_mask(20, 20, rows=2, cols=2)
        ref = np.zeros((20, 20), np.int64)
        ref[:10, :10] = 1   # all deforestation in tile 1
        ref[0, 19] = 2
        stats = patch_tiles3([1, 2, 3, 4], m, ref)
        assert stats[1] == 100.0
        assert stats[2] == 0.0


class TestPredictionVariants:
    def test_output_prediction_FC(self):
        img = np.zeros((32, 32, 2), np.float32)
        img[:16, :, 0] = 1.0
        final_mask = np.zeros((32, 32))
        prob, t = output_prediction_FC(_fake_apply, img, final_mask, 16,
                                       batch_size=4)
        assert prob.shape == (32, 32)
        assert prob[:16].min() == 1.0 and prob[16:].max() == 0.0

    def test_prediction2(self):
        img = np.zeros((32, 32, 2), np.float32)
        img[:16, :, 0] = 1.0
        ref = np.zeros((32, 32))
        pred_map, prob_map, ref_map, t = prediction2(
            _fake_apply, img, ref, ref, np.ones_like(ref), 16, area=4,
            batch_size=4)
        assert pred_map.shape == (32, 32)

    def test_prediction2_raises_on_non_tiling_patches(self):
        # a -1 region invalidates one grid patch -> reconstruction would be
        # misaligned; the reference returns a scrambled image, we raise
        img = np.zeros((32, 32, 2), np.float32)
        ref = np.zeros((32, 32))
        ref[0, 0] = -1
        with pytest.raises(ValueError, match="fully valid"):
            prediction2(_fake_apply, img, ref, ref, np.ones_like(ref), 16,
                        area=4, batch_size=4)

    def test_matrics_AA_recall_full(self):
        prob = np.zeros((32, 32))
        prob[:16, :16] = 0.9        # big predicted blob
        prob[30:32, 30:32] = 0.9    # tiny blob, area-opened away
        ref = np.zeros((32, 32))
        ref[:16, :16] = 1
        mask = np.ones((32, 32))
        rows = matrics_AA_recall([0.5], prob, ref, mask, area=11)
        recall, precision, aa = rows[0]
        assert recall == 1.0
        assert precision == 1.0  # tiny blob removed from consideration
