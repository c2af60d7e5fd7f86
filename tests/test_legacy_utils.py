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
