"""Pallas TPU kernel: boundary-label generation (OpenCV-parity Canny + 3x3 cross
dilation) for one-hot class planes.

Mirrors ops/boundary.py exactly (same Sobel/NMS/hysteresis arithmetic, so the
cv2 golden tests apply), but keeps the plane and all intermediates on-chip:
one HBM load (int mask), one HBM store (float boundary). Shifts are
implemented as lane/sublane rolls + iota masks (Mosaic-friendly — offset slices
are not supported on the lane dimension).

Two layouts:
  * whole-plane — one grid program per (batch x class) plane, the plane lives in
    VMEM for the whole computation. ~15 concurrent (H, W) int32 temporaries, so
    it only fits below ~384^2.
  * row-tiled — for larger planes (512px+ training patches). Each grid program
    sees three vertically-adjacent (TILE, W) row blocks of the plane (previous /
    current / next, block index clamped at the image edges) and emits the middle
    one. Hysteresis influence is bounded: each of the `hysteresis_iters` growth
    steps moves edges by at most one row and the Sobel/NMS/dilate stencils add
    3 more, so TILE >= hysteresis_iters + 3 halo rows on each side make every
    output row BIT-IDENTICAL to the whole-plane result. Border masks are
    computed against GLOBAL row coordinates, so (a) replicate/zero borders land
    at the true image edges, not tile edges, and (b) the clamped duplicate
    blocks at the first/last tile are inert — any stencil read that crosses the
    real image border is masked to border semantics before it can leak
    duplicate content. Blocked VMEM specs keep the kernel vmap-able (the fused
    train pipeline maps label generation over the batch).
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

# Whole-plane kernel budget: ~15 concurrent (H, W) int32 temporaries must stay
# inside the ~16 MB scoped-vmem budget (observed to break at 512x512).
MAX_PLANE_ELEMS = 384 * 384

_HYSTERESIS_ITERS = 32
# scoped-VMEM budget for the row-tiled kernel. Hardware measurement: the
# 3-tile band costs ~22 int32 band-sized buffers (live temporaries + input
# double-buffering; tile=128 x W=512 compiled to 17.0 MB against the 16 MB
# v5e limit), so plan with that multiplier against a 15.5 MB ceiling.
_TILE_BUDGET_BYTES = int(15.5e6)
_TILE_COST_BUFFERS = 22


def _halo(hysteresis_iters):
    # 1 row Sobel + 2 rows NMS/threshold + hysteresis_iters growth + 1 dilate
    return hysteresis_iters + 3


def _plan_tile(H, W, hysteresis_iters=_HYSTERESIS_ITERS):
    """Largest power-of-two row-tile (divisor of H, >= the hysteresis halo)
    whose 3-tile band fits the VMEM budget, or None if the plane can't be
    row-tiled."""
    halo = _halo(hysteresis_iters)
    tile = 512
    while tile >= 8:
        if (H % tile == 0 and tile >= halo and H // tile >= 2
                and _TILE_COST_BUFFERS * 4 * 3 * tile * W <= _TILE_BUDGET_BYTES):
            return tile
        tile //= 2
    return None


def pallas_available(H, W=None):
    """True if some Pallas layout (whole-plane or row-tiled) covers (H, W).
    Accepts pallas_available(plane_elems) for backward compatibility."""
    if not (_PALLAS_OK and jax.default_backend() == "tpu"):
        return False
    if W is None:  # legacy single-argument form: H is plane_elems
        return H <= MAX_PLANE_ELEMS
    return H * W <= MAX_PLANE_ELEMS or _plan_tile(H, W) is not None


def _roll_shift(arr, di, dj):
    """Circular roll so that out[i, j] = arr_wrapped[i+di, j+dj]."""
    H, W = arr.shape
    out = arr
    if di % H:
        out = pltpu.roll(out, (-di) % H, axis=0)
    if dj % W:
        out = pltpu.roll(out, (-dj) % W, axis=1)
    return out


def _canny_core(img, row0, Hg, hysteresis_iters):
    """Canny(0,1) + cross dilation on an int32 row band.

    img is a (BUF, W) band whose first row is global row `row0` (traced scalar)
    of an Hg-row image; border masks use global coordinates so image-edge
    semantics (BORDER_REPLICATE for Sobel, zero-pad for NMS magnitudes) apply at
    the true image borders. Rows closer than the halo to a band edge compute
    garbage that the caller slices away."""
    B, W = img.shape
    ii_g = jax.lax.broadcasted_iota(jnp.int32, (B, W), 0) + row0
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    def valid(di, dj):
        return ((ii_g + di >= 0) & (ii_g + di < Hg)
                & (jj + dj >= 0) & (jj + dj < W))

    def shift_zero(arr, di, dj):
        return jnp.where(valid(di, dj), _roll_shift(arr, di, dj), 0)

    def shift_replicate1(arr, di, dj):
        # clamp(i+di) == i at the border, so invalid takes the unshifted value
        return jnp.where(valid(di, dj), _roll_shift(arr, di, dj), arr)

    # Sobel (aperture 3, BORDER_REPLICATE) — separable via +-1 replicate shifts
    up = shift_replicate1(img, -1, 0)
    dn = shift_replicate1(img, 1, 0)
    sm_v = up + 2 * img + dn                       # smooth along rows
    dx = shift_replicate1(sm_v, 0, 1) - shift_replicate1(sm_v, 0, -1)
    lf = shift_replicate1(img, 0, -1)
    rt = shift_replicate1(img, 0, 1)
    sm_h = lf + 2 * img + rt                       # smooth along cols
    dy = shift_replicate1(sm_h, 1, 0) - shift_replicate1(sm_h, -1, 0)

    mag = jnp.abs(dx) + jnp.abs(dy)

    m_l = shift_zero(mag, 0, -1)
    m_r = shift_zero(mag, 0, 1)
    m_u = shift_zero(mag, -1, 0)
    m_d = shift_zero(mag, 1, 0)
    m_ul = shift_zero(mag, -1, -1)
    m_ur = shift_zero(mag, -1, 1)
    m_dl = shift_zero(mag, 1, -1)
    m_dr = shift_zero(mag, 1, 1)

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

    def dilate8_i(b):
        out = b
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                out = out | shift_zero(b, di, dj)
        return out

    def cond(carry):
        i, edges_i, changed = carry
        return (i < hysteresis_iters) & (changed > 0)

    def body(carry):
        i, edges_i, _ = carry
        grown = edges_i | (weak_i & dilate8_i(edges_i))
        changed = jnp.max(grown ^ edges_i)
        return i + 1, grown, changed

    _, edges_i, _ = jax.lax.while_loop(
        cond, body, (0, strong.astype(jnp.int32), any_weak))
    edges = edges_i > 0

    # 3x3 cross dilation (cv2.MORPH_CROSS)
    e = edges
    bound = (e | shift_zero(e.astype(jnp.int32), 0, -1).astype(jnp.bool_)
             | shift_zero(e.astype(jnp.int32), 0, 1).astype(jnp.bool_)
             | shift_zero(e.astype(jnp.int32), -1, 0).astype(jnp.bool_)
             | shift_zero(e.astype(jnp.int32), 1, 0).astype(jnp.bool_))
    return bound.astype(jnp.float32)


def _canny_dilate_kernel(in_ref, out_ref, *, H, W, hysteresis_iters):
    out_ref[0] = _canny_core(in_ref[0], 0, H, hysteresis_iters)


def _canny_tiled_kernel(prev_ref, cur_ref, next_ref, out_ref, *, H, W, tile,
                        hysteresis_iters):
    t = pl.program_id(1)
    band = jnp.concatenate([prev_ref[0], cur_ref[0], next_ref[0]], axis=0)
    # the caller padded one zero tile above and below the plane, so block t+k
    # holds global rows [(t+k-1)*tile, (t+k)*tile) and the band starts at
    # global row (t-1)*tile; rows outside [0, H) are zero AND masked to true
    # border semantics by _canny_core's global-coordinate masks
    row0 = (t - 1) * tile
    bound = _canny_core(band, row0, H, hysteresis_iters)
    out_ref[0] = bound[tile:2 * tile, :]


@functools.partial(jax.jit, static_argnames=("hysteresis_iters", "interpret"))
def boundary_label_pallas(planes, hysteresis_iters: int = _HYSTERESIS_ITERS,
                          interpret: bool = False):
    """Canny(0,1) + cross dilation over (N, H, W) binary planes -> (N, H, W) f32.

    Picks the whole-plane layout when the plane fits VMEM, else the row-tiled
    layout (bit-identical, see module docstring)."""
    N, H, W = planes.shape
    planes = planes.astype(jnp.int32)

    if H * W <= MAX_PLANE_ELEMS:
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
        )(planes)

    tile = _plan_tile(H, W, hysteresis_iters)
    if tile is None:
        raise ValueError(f"no Pallas layout for plane ({H}, {W}); "
                         "guard calls with pallas_available(H, W)")
    T = H // tile
    kernel = functools.partial(_canny_tiled_kernel, H=H, W=W, tile=tile,
                               hysteresis_iters=hysteresis_iters)

    # one zero tile of padding above and below: the prev/cur/next row-block
    # index maps stay strictly monotone in t (clamped duplicate blocks
    # mis-pipeline in interpret mode), and padded rows are inert — they are
    # masked to border semantics by the global-coordinate masks anyway
    padded = jnp.pad(planes, ((0, 0), (tile, tile), (0, 0)))

    def blk(shift):
        return pl.BlockSpec((1, tile, W),
                            lambda i, t: (i, t + shift, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[blk(0), blk(1), blk(2)],  # rows (t-1, t, t+1)*tile of the plane
        out_specs=pl.BlockSpec((1, tile, W), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.float32),
        interpret=interpret,
    )(padded, padded, padded)
