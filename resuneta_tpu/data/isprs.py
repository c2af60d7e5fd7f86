"""ISPRS Potsdam dataset specifics: the label color dictionary and fast RGB<->class
conversions.

label_dict matches preprocess_save_patches_ISPRS.py:155-156 / test_ISPRS.py:262-263:
  (255,255,255) impervious surfaces -> 0     (0,255,0)   trees?        -> 1
  (0,255,255)                        -> 2     (0,0,255)                 -> 3
  (255,255,0)                        -> 4
Unknown colors map to 255 (the reference initializes with uint8 -1, SURVEY.md §5).

The reference converts with an O(H*W) Python pixel loop (binarize_matrix,
preprocess_save_patches_ISPRS.py:51-67) — here it is a vectorized 24-bit LUT.
"""

import numpy as np

LABEL_DICT = {
    (255, 255, 255): 0,
    (0, 255, 0): 1,
    (0, 255, 255): 2,
    (0, 0, 255): 3,
    (255, 255, 0): 4,
}


def binarize_matrix(img_ref_rgb, label_dict=None):
    """(H, W, 3) uint8 RGB reference -> (H, W) uint8 class ids (unknown -> 255)."""
    label_dict = label_dict or LABEL_DICT
    img = np.asarray(img_ref_rgb).astype(np.uint32)
    keys = img[..., 0] << 16 | img[..., 1] << 8 | img[..., 2]
    lut = np.full(1 << 24, 255, np.uint8)
    for rgb, cid in label_dict.items():
        if isinstance(rgb, str):  # accept the reference's "(r, g, b)" string keys
            rgb = tuple(int(v) for v in rgb.strip("()").split(","))
        lut[(rgb[0] << 16) | (rgb[1] << 8) | rgb[2]] = cid
    return lut[keys]


def class_ids_to_rgb(ids, label_dict=None):
    """(H, W) class ids -> (H, W, 3) uint8 RGB via the reversed label dict
    (test_ISPRS.py:89-99 convert_preds2rgb)."""
    label_dict = label_dict or LABEL_DICT
    palette = np.zeros((256, 3), np.uint8)
    for rgb, cid in label_dict.items():
        if isinstance(rgb, str):
            rgb = tuple(int(v) for v in rgb.strip("()").split(","))
        palette[cid] = rgb
    return palette[np.asarray(ids).astype(np.int64)]


def load_npy_image(path):
    """utils.py:38-42."""
    return np.load(path)
