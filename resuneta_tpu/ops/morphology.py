"""Morphology ops for the Amazon workload, replacing scikit-image.

  - disk(r): skimage.morphology.disk-compatible structuring element
  - dilation_disk: grey dilation with a disk footprint (utils.py:497 mask_no_considered)
    as a max over the disk's offsets — a handful of vectorized shifts, TPU-friendly
  - mask_no_considered: buffer generation around deforestation (utils.py:494-503)
  - area_opening: grayscale area opening (skimage.morphology.area_opening,
    utils.py:529) via per-level connected components — host-side scipy.ndimage,
    eval-only post-processing exactly like the reference
"""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi


def disk(radius):
    """skimage.morphology.disk: pixels with L2 distance <= radius."""
    L = np.arange(-radius, radius + 1)
    X, Y = np.meshgrid(L, L)
    return ((X ** 2 + Y ** 2) <= radius ** 2).astype(np.uint8)


def dilation_disk(image, radius):
    """Grey dilation by a disk footprint. Accepts numpy or jax arrays (H, W)."""
    fp = disk(radius)
    offsets = [(int(i - radius), int(j - radius))
               for i, j in zip(*np.nonzero(fp))]
    if isinstance(image, np.ndarray):
        H, W = image.shape
        out = image.copy()
        for di, dj in offsets:
            if di == 0 and dj == 0:
                continue
            shifted = np.full_like(image, np.iinfo(image.dtype).min
                                   if np.issubdtype(image.dtype, np.integer) else -np.inf)
            src = image[max(di, 0): H + min(di, 0), max(dj, 0): W + min(dj, 0)]
            shifted[max(-di, 0): max(-di, 0) + src.shape[0],
                    max(-dj, 0): max(-dj, 0) + src.shape[1]] = src
            out = np.maximum(out, shifted)
        return out
    else:
        x = image
        H, W = x.shape
        out = x
        for di, dj in offsets:
            if di == 0 and dj == 0:
                continue
            pad = jnp.full_like(x, jnp.finfo(x.dtype).min
                                if jnp.issubdtype(x.dtype, jnp.floating) else
                                jnp.iinfo(x.dtype).min)
            src = x[max(di, 0): H + min(di, 0), max(dj, 0): W + min(dj, 0)]
            import jax.lax as lax
            shifted = lax.dynamic_update_slice(pad, src, (max(-di, 0), max(-dj, 0)))
            out = jnp.maximum(out, shifted)
        return out


def mask_no_considered(image_ref, buffer, past_ref):
    """Amazon 3-class mask build (utils.py:494-503): dilate current deforestation by
    disk(buffer); the dilation ring becomes class 2 ('not considered'), and all past
    deforestation is forced to class 2."""
    image_ref_ = np.asarray(image_ref).copy()
    im_dilate = dilation_disk(image_ref_, buffer)
    outer_buffer = im_dilate - image_ref_
    outer_buffer[outer_buffer == 1] = 2
    final_mask = image_ref_ + outer_buffer
    final_mask[np.asarray(past_ref) == 1] = 2
    return final_mask


def area_opening(image, area_threshold=64, connectivity=1):
    """Grayscale area opening (skimage.morphology.area_opening semantics): lower each
    pixel to the highest level v such that its connected component in {image >= v}
    has at least `area_threshold` pixels. connectivity=1 -> 4-neighborhood."""
    img = np.asarray(image)
    structure = ndi.generate_binary_structure(2, connectivity)
    out = np.zeros_like(img)
    levels = np.unique(img)
    for v in levels:
        if v <= out.min() and v <= 0:
            continue
        mask = img >= v
        labels, n = ndi.label(mask, structure=structure)
        if n == 0:
            continue
        sizes = np.bincount(labels.ravel())
        keep = sizes >= area_threshold
        keep[0] = False
        keep_mask = keep[labels]
        out = np.where(keep_mask, np.maximum(out, v), out)
    return out.astype(img.dtype)
