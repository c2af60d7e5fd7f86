"""Amazon deforestation workload helpers.

The reference splits two co-registered 7-band rasters (concatenated to 14 channels,
amazon_py/main.py:11-19) into a 5x3 = 15-tile grid with hand-picked train/val/test
tile ids (main.py:43-64, preprocess_save_patches_Amazon.py:239-264), extracts
patches per tile, and keeps only patches with >= percent% deforestation
(utils.py:344-400, utils2.py:115-139).

These are host-side offline dataset-build utilities (the training hot path uses the
packed dataset + device pipeline).
"""

import numpy as np

from ..ops.patches import extract_patches


def data_augmentation(image, labels):
    """The reference's exactly-5 augmentation variants (utils.py:69-95), host-side.
    image: (H, W, C); labels: (H, W). Returns float copies stacked on axis 0."""
    aug_imgs = np.stack([
        image, np.rot90(image, 1), np.rot90(image, 2),
        np.flip(image, 0), np.flip(image, 1),
    ])
    aug_lbs = np.stack([
        labels, np.rot90(labels, 1), np.rot90(labels, 2),
        np.flip(labels, 0), np.flip(labels, 1),
    ])
    return aug_imgs, aug_lbs


def make_tile_mask(height, width, rows=5, cols=3):
    """15-tile id mask (ids 1..rows*cols, row-major), the generalized version of the
    hardcoded concatenations in main.py:43-49."""
    tile_h, tile_w = height // rows, width // cols
    mask = np.zeros((tile_h * rows, tile_w * cols), np.int32)
    tid = 1
    for r in range(rows):
        for c in range(cols):
            mask[r * tile_h:(r + 1) * tile_h, c * tile_w:(c + 1) * tile_w] = tid
            tid += 1
    return mask


def tile_bbox(mask_tiles, tile_id):
    rows, cols = np.where(mask_tiles == tile_id)
    return rows.min(), cols.min(), rows.max(), cols.max()


def patch_tiles(tiles, mask_tiles, image_array, image_ref, patch_size, stride):
    """utils.py:344-380: per-tile bbox crop -> overlapping patch extraction."""
    patches_out, label_out = [], []
    for tid in tiles:
        x1, y1, x2, y2 = tile_bbox(mask_tiles, tid)
        tile_img = image_array[x1:x2 + 1, y1:y2 + 1, :]
        tile_ref = image_ref[x1:x2 + 1, y1:y2 + 1]
        p, r = extract_patches(tile_img, tile_ref, patch_size, stride)
        patches_out.append(p)
        label_out.append(r)
    return np.concatenate(patches_out), np.concatenate(label_out)


def patch_tiles2(tiles, mask_tiles, image_array, image_ref, mask_valid,
                 patch_size, stride, percent):
    """utils2.py:115-139 (repaired): per-tile extraction keeping only fully-valid
    patches (mask_valid == -1 everywhere, the satellite footprint convention) with
    >= percent% deforestation."""
    patches_out, label_out = [], []
    for tid in tiles:
        x1, y1, x2, y2 = tile_bbox(mask_tiles, tid)
        p, r = extract_patches(
            image_array[x1:x2 + 1, y1:y2 + 1, :],
            image_ref[x1:x2 + 1, y1:y2 + 1], patch_size, stride)
        m, _ = extract_patches(
            mask_valid[x1:x2 + 1, y1:y2 + 1, None].astype(np.float32),
            image_ref[x1:x2 + 1, y1:y2 + 1], patch_size, stride)
        valid = np.all(m[..., 0] == -1, axis=(1, 2))
        frac = np.mean(r == 1, axis=(1, 2))
        keep = valid & (frac >= percent / 100.0)
        patches_out.append(p[keep])
        label_out.append(r[keep])
    return np.concatenate(patches_out), np.concatenate(label_out)


def bal_aug_patches(percent, patch_size, patches_img, patches_ref):
    """utils.py:383-400: keep patches with >= percent% class-1 pixels, augment x5."""
    imgs, lbls = [], []
    threshold = int((patch_size ** 2) * (percent / 100.0))
    for i in range(len(patches_img)):
        if np.sum(patches_ref[i] == 1) >= threshold:
            a_img, a_lbl = data_augmentation(patches_img[i], patches_ref[i])
            imgs.append(a_img)
            lbls.append(a_lbl)
    patches_bal = np.concatenate(imgs).astype(np.float32)
    labels_bal = np.concatenate(lbls).astype(np.float32)
    return patches_bal, labels_bal


def class_weights_from_counts(final_mask):
    """WCE weights from pixel counts (preprocess_save_patches_Amazon.py:229-232):
    weight_c = total / count_c for classes 0 and 1; class 2 (not considered) -> 0."""
    unique, counts = np.unique(final_mask, return_counts=True)
    d = dict(zip(unique.tolist(), counts.tolist()))
    total = d.get(0, 0) + d.get(1, 0) + d.get(2, 0)
    return [total / max(d.get(0, 1), 1), total / max(d.get(1, 1), 1), 0.0]
