"""RGB <-> HSV colorspace ops, matching OpenCV's 8-bit conventions on-device.

The reference generates HSV color-head labels with ``cv2.cvtColor(img, cv2.COLOR_RGB2HSV)``
on uint8 patches and then normalizes channel-wise by [179, 255, 255]
(reference: preprocess_save_patches_ISPRS.py:223-228, multitask color head).
OpenCV's uint8 HSV convention is H in [0, 179] (degrees / 2), S and V in [0, 255].

Everything here is pure JAX (elementwise, VPU-friendly) so label generation can run
on-device inside the jitted input pipeline instead of on the host with OpenCV.
"""

import numpy as np
import jax.numpy as jnp

# OpenCV's fixed-point division tables for 8-bit RGB2HSV (imgproc color_hsv:
# hsv_shift = 12, sdiv[i] = round(255<<12 / i), hdiv[i] = round(180<<12 / (6i))).
# Kept as numpy arrays for tests/host use; the device path computes the table
# values arithmetically instead — a 256-entry gather over a megapixel batch
# lowers to an embarrassingly slow scatter/gather loop on TPU (profiled at
# 2x8.6 ms/step, the two largest ops in the entire train program), while the
# equivalent round-half-even division is a handful of VPU ops.
_HSV_SHIFT = 12
_SDIV = np.zeros(256, np.int32)
_HDIV = np.zeros(256, np.int32)
_SDIV[1:] = np.round((255 << _HSV_SHIFT) / np.arange(1, 256, dtype=np.float64))
_HDIV[1:] = np.round((180 << _HSV_SHIFT) / (6.0 * np.arange(1, 256, dtype=np.float64)))


def _round_div_half_even(num: int, den):
    """round(num / den) with ties to even — cvRound semantics — for a python-int
    numerator and an int32 array denominator; den == 0 maps to 0 (the tables'
    convention). Exact integer arithmetic, no gathers.

    A float32 division seeds the quotient, then an exact int32 remainder check
    corrects it: |f32 error| < 1 for these magnitudes (num <= 255<<12 < 2^24)."""
    den_safe = jnp.maximum(den, 1)
    q = jnp.round(jnp.float32(num) / den_safe.astype(jnp.float32)).astype(jnp.int32)
    rem = num - q * den_safe  # may be negative if q overshot
    q = jnp.where(rem < 0, q - 1, q)
    rem = jnp.where(rem < 0, rem + den_safe, rem)
    twice = 2 * rem
    q = jnp.where(twice > den_safe, q + 1, q)
    q = jnp.where(twice == den_safe, q + (q & 1), q)
    return jnp.where(den > 0, q, 0)


def rgb_to_hsv_cv2(rgb):
    """Convert RGB (uint8 values, shape [..., 3]) to cv2-style HSV.

    Bit-exact emulation of OpenCV's 8-bit fixed-point RGB2HSV (hsv_shift=12 integer
    arithmetic with rounding tables), returned as float32: H in [0, 180),
    S and V in [0, 255] (reference: cv2.COLOR_RGB2HSV on uint8).
    """
    rgb = rgb.astype(jnp.int32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn

    # table values computed arithmetically (see _round_div_half_even): TPU has
    # no fast gather, and these two lookups profiled as the costliest ops in
    # the whole fused train step.
    sdiv = _round_div_half_even(255 << _HSV_SHIFT, v)
    hdiv = _round_div_half_even((180 << _HSV_SHIFT) // 6, diff)
    half = 1 << (_HSV_SHIFT - 1)

    s = (diff * sdiv + half) >> _HSV_SHIFT

    # branch priority: v==r first, then v==g, then b (OpenCV's mask chain)
    h_num = jnp.where(
        v == r, g - b, jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff)
    )
    h = (h_num * hdiv + half) >> _HSV_SHIFT
    h = jnp.where(h < 0, h + 180, h)

    return jnp.stack([h, s, v], axis=-1).astype(jnp.float32)


def hsv_to_rgb_cv2(hsv):
    """Inverse of :func:`rgb_to_hsv_cv2`: cv2-style HSV (H in [0,180), S/V in [0,255])
    back to RGB in [0, 255] float32. Used by test-time visualization
    (reference: test_ISPRS.py:398-399 uses cv2.COLOR_HSV2RGB)."""
    hsv = hsv.astype(jnp.float32)
    h = hsv[..., 0] * 2.0  # degrees
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2]

    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    m = v - c

    zeros = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, x, zeros, zeros, x, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [x, c, c, x, zeros, zeros])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [zeros, zeros, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def hsv_color_label(rgb_u8, norm_type: int = 1):
    """Full color-head label: RGB uint8 patch -> normalized HSV float32.

    Matches the reference chain cv2.cvtColor(RGB2HSV) -> normalize_hsv
    (preprocess_save_patches_ISPRS.py:89-109,223-228), including the norm_type=2
    quirk where the code computes ``img /= (k - 1.)`` (i.e. divide by 88.5/126.5),
    NOT ``img/k - 1`` — preserved deliberately, see SURVEY.md §5.
    """
    hsv = rgb_to_hsv_cv2(rgb_u8)
    if norm_type == 1:
        scale = jnp.asarray([1.0 / 179.0, 1.0 / 255.0, 1.0 / 255.0], jnp.float32)
        return hsv * scale
    elif norm_type == 2:
        scale = jnp.asarray([1.0 / (89.5 - 1.0), 1.0 / (127.5 - 1.0), 1.0 / (127.5 - 1.0)],
                            jnp.float32)
        return hsv * scale
    elif norm_type == 3:
        flat = hsv.reshape(-1, hsv.shape[-1])
        mean = flat.mean(axis=0)
        std = flat.std(axis=0)
        std = jnp.where(std == 0, 1.0, std)
        return ((flat - mean) / std).reshape(hsv.shape)
    else:
        raise ValueError(f"unknown norm_type {norm_type}")
