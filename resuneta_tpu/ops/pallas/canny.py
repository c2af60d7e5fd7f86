"""Pallas TPU kernel: boundary-label generation (OpenCV-parity Canny + 3x3 cross
dilation) for one-hot class planes, VMEM-resident.

Mirrors ops/boundary.py exactly (same Sobel/NMS/hysteresis arithmetic, so the
cv2 golden tests apply), but keeps the plane and all intermediates on-chip:
one HBM load (uint/int mask), one HBM store (float boundary). Shifts are
implemented as lane/sublane rolls + iota masks (Mosaic-friendly — offset slices
are not supported on the lane dimension).
"""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_TG22 = 13573


# The kernel holds ~15 concurrent (H, W) int32 temporaries in VMEM; above this
# plane size it exceeds the ~16 MB scoped-vmem budget (observed at 512x512).
MAX_PLANE_ELEMS = 384 * 384


def pallas_available(plane_elems=0):
    return (_PALLAS_OK and jax.default_backend() == "tpu"
            and plane_elems <= MAX_PLANE_ELEMS)


def _roll_shift(arr, di, dj):
    """Circular roll so that out[i, j] = arr_wrapped[i+di, j+dj]."""
    H, W = arr.shape
    out = arr
    if di % H:
        out = pltpu.roll(out, (-di) % H, axis=0)
    if dj % W:
        out = pltpu.roll(out, (-dj) % W, axis=1)
    return out


def _valid_mask(H, W, di, dj):
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    return (ii + di >= 0) & (ii + di < H) & (jj + dj >= 0) & (jj + dj < W)


def _shift_zero(arr, di, dj):
    """out[i,j] = arr[i+di, j+dj], out-of-bounds -> 0 (OpenCV's zero-padded mag)."""
    H, W = arr.shape
    return jnp.where(_valid_mask(H, W, di, dj), _roll_shift(arr, di, dj), 0)


def _shift_replicate1(arr, di, dj):
    """Replicate-border shift for |di|,|dj| <= 1: clamp(i+di) == i at the border,
    so the invalid region takes the unshifted value."""
    H, W = arr.shape
    return jnp.where(_valid_mask(H, W, di, dj), _roll_shift(arr, di, dj), arr)


def _canny_dilate_kernel(in_ref, out_ref, *, H, W, hysteresis_iters):
    img = in_ref[0].astype(jnp.int32)

    # Sobel (aperture 3, BORDER_REPLICATE) — separable via +-1 replicate shifts
    up = _shift_replicate1(img, -1, 0)
    dn = _shift_replicate1(img, 1, 0)
    sm_v = up + 2 * img + dn                       # smooth along rows
    dx = _shift_replicate1(sm_v, 0, 1) - _shift_replicate1(sm_v, 0, -1)
    lf = _shift_replicate1(img, 0, -1)
    rt = _shift_replicate1(img, 0, 1)
    sm_h = lf + 2 * img + rt                       # smooth along cols
    dy = _shift_replicate1(sm_h, 1, 0) - _shift_replicate1(sm_h, -1, 0)

    mag = jnp.abs(dx) + jnp.abs(dy)

    m_l = _shift_zero(mag, 0, -1)
    m_r = _shift_zero(mag, 0, 1)
    m_u = _shift_zero(mag, -1, 0)
    m_d = _shift_zero(mag, 1, 0)
    m_ul = _shift_zero(mag, -1, -1)
    m_ur = _shift_zero(mag, -1, 1)
    m_dl = _shift_zero(mag, 1, -1)
    m_dr = _shift_zero(mag, 1, 1)

    x_abs = jnp.abs(dx)
    y_sh = jnp.abs(dy) << 15
    tg22x = x_abs * _TG22
    tg67x = tg22x + ((x_abs + x_abs) << 15)
    horiz = y_sh < tg22x
    vert = y_sh > tg67x
    s_neg = (dx ^ dy) < 0

    keep_h = (mag > m_l) & (mag >= m_r)
    keep_v = (mag > m_u) & (mag >= m_d)
    keep_d_pos = (mag > m_ul) & (mag > m_dr)
    keep_d_neg = (mag > m_ur) & (mag > m_dl)
    # boolean algebra instead of select_n — Mosaic can't select on i1 vectors
    keep_diag = (s_neg & keep_d_neg) | (~s_neg & keep_d_pos)
    kept = (horiz & keep_h) | (~horiz & vert & keep_v) | (~horiz & ~vert & keep_diag)
    kept = kept & (mag > 0)   # low threshold = 0

    strong = kept & (mag > 1)  # high threshold = 1
    weak = kept & ~strong

    # int32 carries: Mosaic's while lowering rejects i1 vector carries
    weak_i = weak.astype(jnp.int32)
    any_weak = jnp.any(weak).astype(jnp.int32)

    def cond(carry):
        i, edges_i, changed = carry
        return (i < hysteresis_iters) & (changed > 0)

    def body(carry):
        i, edges_i, _ = carry
        grown = edges_i | (weak_i & dilate8_i(edges_i))
        changed = jnp.max(grown ^ edges_i)
        return i + 1, grown, changed

    def dilate8_i(b):
        out = b
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                out = out | _shift_zero(b, di, dj)
        return out

    _, edges_i, _ = jax.lax.while_loop(
        cond, body, (0, strong.astype(jnp.int32), any_weak))
    edges = edges_i > 0

    # 3x3 cross dilation (cv2.MORPH_CROSS)
    e = edges
    bound = (e | _shift_zero(e.astype(jnp.int32), 0, -1).astype(jnp.bool_)
             | _shift_zero(e.astype(jnp.int32), 0, 1).astype(jnp.bool_)
             | _shift_zero(e.astype(jnp.int32), -1, 0).astype(jnp.bool_)
             | _shift_zero(e.astype(jnp.int32), 1, 0).astype(jnp.bool_))
    out_ref[0] = bound.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("hysteresis_iters", "interpret"))
def boundary_label_pallas(planes, hysteresis_iters: int = 32,
                          interpret: bool = False):
    """Canny(0,1) + cross dilation over (N, H, W) binary planes -> (N, H, W) f32."""
    N, H, W = planes.shape
    kernel = functools.partial(_canny_dilate_kernel, H=H, W=W,
                               hysteresis_iters=hysteresis_iters)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        interpret=interpret,
    )(planes.astype(jnp.int32))
