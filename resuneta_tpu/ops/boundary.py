"""Boundary-label generation: a vectorized, on-device equivalent of
cv2.Canny(channel, 0, 1) followed by 3x3 cross dilation
(reference: multitasking_utils.py:6-23 get_boundary_label).

The reference runs Canny per one-hot class channel on a binary {0,1} uint8 image.
This module reimplements OpenCV's Canny pipeline (Sobel aperture 3, L1 magnitude,
OpenCV's exact non-maximum-suppression quantization and tie-breaking, hysteresis)
as pure vectorized JAX — no data-dependent shapes, so it jits and vmaps cleanly and
runs on the TPU VPU inside the input pipeline.

OpenCV reference semantics (modules/imgproc/src/canny.cpp):
  mag = |dx| + |dy| (L1), Sobel with BORDER_REPLICATE, magnitude ring padded with 0
  NMS sector via TG22 = 13573 (= tan(22.5deg) * 2^15) fixed-point comparisons:
    y<<15 <  x*TG22             -> horizontal: keep if m > mag[left]  and m >= mag[right]
    y<<15 >  x*TG22 + (2x<<15)  -> vertical:   keep if m > mag[up]    and m >= mag[down]
    else                        -> diagonal:   s = sign(dx^dy);
                                   keep if m > mag[up, -s] and m > mag[down, +s]
  strong = kept and mag > high; weak = kept and mag > low; hysteresis: weak pixels
  8-connected to strong become edges.
"""

import jax
import jax.numpy as jnp

_TG22 = 13573  # tan(22.5 deg) * 2^15, OpenCV fixed point constant


def _sobel_replicate(img_i32):
    """Sobel dx, dy (aperture 3) with replicate border, int32 exact arithmetic."""
    p = jnp.pad(img_i32, 1, mode="edge")
    # separable: smooth [1,2,1], derive [-1,0,1]
    # dx: derivative along axis 1 (columns), smoothing along axis 0 (rows)
    sm_rows = p[:-2, :] + 2 * p[1:-1, :] + p[2:, :]          # (H, W+2)
    dx = sm_rows[:, 2:] - sm_rows[:, :-2]                      # (H, W)
    sm_cols = p[:, :-2] + 2 * p[:, 1:-1] + p[:, 2:]            # (H+2, W)
    dy = sm_cols[2:, :] - sm_cols[:-2, :]                      # (H, W)
    return dx, dy


def _shift(arr, di, dj):
    """Shift arr by (di, dj) with zero fill — mag neighbors outside are 0 in OpenCV."""
    H, W = arr.shape
    out = jnp.zeros_like(arr)
    src = arr[max(di, 0): H + min(di, 0), max(dj, 0): W + min(dj, 0)]
    return jax.lax.dynamic_update_slice(out, src, (max(-di, 0), max(-dj, 0)))


def canny_binary(img, low: int = 0, high: int = 1, hysteresis_iters: int = 32):
    """OpenCV-compatible Canny on a single-channel image (any 0/255-range uint8-like
    content; the reference feeds binary {0,1}). Returns float32 {0,1} edge map.

    hysteresis_iters bounds the weak-edge propagation (a fixed-trip-count while loop
    keeps XLA happy; weak pixels are rare for binary inputs so 32 rounds is plenty).
    """
    img = img.astype(jnp.int32)
    dx, dy = _sobel_replicate(img)
    mag = jnp.abs(dx) + jnp.abs(dy)

    m_l = _shift(mag, 0, -1)
    m_r = _shift(mag, 0, 1)
    m_u = _shift(mag, -1, 0)
    m_d = _shift(mag, 1, 0)
    m_ul = _shift(mag, -1, -1)
    m_ur = _shift(mag, -1, 1)
    m_dl = _shift(mag, 1, -1)
    m_dr = _shift(mag, 1, 1)

    x_abs = jnp.abs(dx)
    y_sh = jnp.abs(dy) << 15
    tg22x = x_abs * _TG22
    tg67x = tg22x + ((x_abs + x_abs) << 15)

    horiz = y_sh < tg22x
    vert = y_sh > tg67x
    s_neg = (dx ^ dy) < 0  # diagonal orientation sign

    keep_h = (mag > m_l) & (mag >= m_r)
    keep_v = (mag > m_u) & (mag >= m_d)
    # s = -1 if (dx^dy)<0 else 1; compare mag > mag[up_row at col -s] and > mag[down_row at col +s]
    keep_d_pos = (mag > m_ul) & (mag > m_dr)   # s = +1
    keep_d_neg = (mag > m_ur) & (mag > m_dl)   # s = -1
    keep_diag = jnp.where(s_neg, keep_d_neg, keep_d_pos)

    kept = jnp.where(horiz, keep_h, jnp.where(vert, keep_v, keep_diag))
    kept = kept & (mag > low)

    strong = kept & (mag > high)
    weak = kept & ~strong

    def dilate8(b):
        return (
            b
            | _shift(b, 0, -1) | _shift(b, 0, 1) | _shift(b, -1, 0) | _shift(b, 1, 0)
            | _shift(b, -1, -1) | _shift(b, -1, 1) | _shift(b, 1, -1) | _shift(b, 1, 1)
        )

    # Weak->strong propagation with a fixpoint early exit: for binary one-hot
    # inputs weak pixels (mag == 1 after NMS) are vanishingly rare, so this
    # usually terminates after one round instead of burning `hysteresis_iters`
    # full-image dilations (the dominant cost of the naive unrolled version).
    any_weak = jnp.any(weak)

    def cond(carry):
        i, edges, changed = carry
        return (i < hysteresis_iters) & changed

    def body(carry):
        i, edges, _ = carry
        grown = edges | (weak & dilate8(edges))
        changed = jnp.any(grown != edges)
        return i + 1, grown, changed

    _, edges, _ = jax.lax.while_loop(cond, body, (0, strong, any_weak))
    return edges.astype(jnp.float32)


def cross_dilate(x, iterations: int = 1):
    """Binary dilation with the 3x3 cross structuring element
    (cv2.getStructuringElement(cv2.MORPH_CROSS, (3,3)))."""
    out = x
    for _ in range(iterations):
        b = out > 0
        b = b | _shift(b, 0, -1) | _shift(b, 0, 1) | _shift(b, -1, 0) | _shift(b, 1, 0)
        out = b
    return out.astype(jnp.float32)


def get_boundary_label(label_hwc, kernel_size=(3, 3)):
    """Multitask boundary label from a one-hot label (H, W, C) — on-device equivalent
    of multitasking_utils.py:6-23: per-channel Canny(0,1) then 3x3 cross dilation,
    output float32 in {0, 1} (the reference's /255 normalization is implicit).
    On TPU this runs as a VMEM-resident Pallas kernel (ops/pallas/canny.py, same
    arithmetic); set RESUNETA_NO_PALLAS=1 to force the XLA path."""
    import os

    assert kernel_size == (3, 3), "reference always uses a 3x3 cross"
    chan_first = jnp.moveaxis(label_hwc, -1, 0)
    if not os.environ.get("RESUNETA_NO_PALLAS") and \
            not os.environ.get("RESUNETA_NO_PALLAS_CANNY"):
        from .pallas.canny import pallas_available, boundary_label_pallas

        if pallas_available(label_hwc.shape[0], label_hwc.shape[1]):
            bounds = boundary_label_pallas(chan_first.astype(jnp.int32))
            return jnp.moveaxis(bounds, 0, -1)
    edges = jax.vmap(canny_binary)(chan_first.astype(jnp.int32))
    bounds = jax.vmap(cross_dilate)(edges)
    return jnp.moveaxis(bounds, 0, -1)
