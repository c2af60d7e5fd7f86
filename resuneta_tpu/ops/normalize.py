"""Input normalization ops, matching the reference's three norm types.

Reference semantics (preprocess_save_patches_ISPRS.py:70-109, utils.py:242-253):
  norm_type 1: img / 255                        (RGB)  — the default everywhere
  norm_type 2: img /= (127.5 - 1.)              — QUIRK: divides by 126.5, it is NOT
               img/127.5 - 1. Preserved deliberately (SURVEY.md §5 quirks list).
  norm_type 3: per-image StandardScaler over flattened pixels, per channel
               (sklearn biased std, ddof=0).

``normalization`` is the whole-image variant used by the Amazon scripts and
test_ISPRS.py:246-247 (types 1=Standard, 2=MinMax[0,1], 3=MinMax[-1,1] — note the
numbering differs from normalize_rgb; this matches utils.py:242-253 exactly).
"""

import jax.numpy as jnp


def standard_scale(img):
    """Per-channel standardization over all pixels of one image (sklearn StandardScaler
    with biased std). img: [..., C]; statistics are computed over all leading dims."""
    img = img.astype(jnp.float32)
    flat = img.reshape(-1, img.shape[-1])
    mean = flat.mean(axis=0)
    std = flat.std(axis=0)
    std = jnp.where(std == 0, 1.0, std)
    return ((flat - mean) / std).reshape(img.shape)


def minmax_scale(img, feature_range=(0.0, 1.0)):
    """Per-channel min-max scaling over all pixels of one image (sklearn MinMaxScaler)."""
    img = img.astype(jnp.float32)
    lo, hi = feature_range
    flat = img.reshape(-1, img.shape[-1])
    mn = flat.min(axis=0)
    mx = flat.max(axis=0)
    rng = jnp.where(mx - mn == 0, 1.0, mx - mn)
    scaled = (flat - mn) / rng * (hi - lo) + lo
    return scaled.reshape(img.shape)


def normalize_rgb(img, norm_type: int = 1):
    """Patch-level RGB normalization (preprocess_save_patches_ISPRS.py:70-86)."""
    img = img.astype(jnp.float32)
    if norm_type == 1:
        return img / 255.0
    elif norm_type == 2:
        return img / (127.5 - 1.0)
    elif norm_type == 3:
        return standard_scale(img)
    raise ValueError(f"unknown norm_type {norm_type}")


def normalize_hsv(img, norm_type: int = 1):
    """Patch-level HSV normalization (preprocess_save_patches_ISPRS.py:89-109)."""
    img = img.astype(jnp.float32)
    if norm_type == 1:
        return img * jnp.asarray([1 / 179.0, 1 / 255.0, 1 / 255.0], jnp.float32)
    elif norm_type == 2:
        return img * jnp.asarray(
            [1 / (89.5 - 1.0), 1 / (127.5 - 1.0), 1 / (127.5 - 1.0)], jnp.float32
        )
    elif norm_type == 3:
        return standard_scale(img)
    raise ValueError(f"unknown norm_type {norm_type}")


def normalization(image, norm_type: int = 1):
    """Whole-image normalization (utils.py:242-253): 1=Standard, 2=MinMax[0,1],
    3=MinMax[-1,1]. Fits the scaler on the image itself (including test images),
    exactly like the reference."""
    if norm_type == 1:
        return standard_scale(image)
    elif norm_type == 2:
        return minmax_scale(image, (0.0, 1.0))
    elif norm_type == 3:
        return minmax_scale(image, (-1.0, 1.0))
    raise ValueError(f"unknown norm_type {norm_type}")
