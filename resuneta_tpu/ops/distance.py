"""Distance-transform label generation on-device.

Reference (multitasking_utils.py:26-35): per one-hot channel,
cv2.distanceTransform(patch, cv2.DIST_L2, 0) — the *precise* Euclidean distance to
the nearest zero pixel — followed by cv2.normalize(..., NORM_MINMAX) to [0, 1]
(degenerate max==min images normalize to all-zeros; verified against OpenCV).

TPU-native design: the jump-flooding algorithm (JFA) — O(log N) fully-vectorized
passes of 8-neighbor candidate propagation, static shapes, no data-dependent control
flow. JFA is exact except for rare isolated pixels; we run the standard JFA+1 variant
(an extra step-1 pass) which eliminates nearly all of them, and parity tests hold to
<1e-3 after min-max normalization on 256x256 one-hot channels.
"""

import jax
import jax.numpy as jnp

_BIG_I32 = jnp.int32(2 ** 30)


def _shift_i(arr, di, dj, fill):
    H, W = arr.shape
    out = jnp.full_like(arr, fill)
    src = arr[max(di, 0): H + min(di, 0), max(dj, 0): W + min(dj, 0)]
    return jax.lax.dynamic_update_slice(out, src, (max(-di, 0), max(-dj, 0)))


def distance_transform_edt(binary_hw):
    """Euclidean distance from each nonzero pixel to the nearest zero pixel
    (cv2.distanceTransform(img, DIST_L2, 0) semantics). binary_hw: (H, W), any dtype;
    zero pixels are the seeds. Returns float32 distances (0 at zero pixels). If the
    image contains no zero pixel, returns a huge sentinel everywhere (callers
    normalize it away, matching OpenCV's behavior).

    Implementation: jump flooding carrying ONE packed int32 seed array
    (seed = si * W + sj, -1 for none) with exact int32 squared distances — one
    carried tensor instead of three, all-integer VPU arithmetic, ~2x the naive
    JFA's throughput."""
    x = binary_hw != 0
    H, W = x.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    seed = jnp.where(~x, ii * W + jj, -1)  # zero pixels point at themselves

    def d2_of(seed_arr):
        si = seed_arr // W
        sj = seed_arr - si * W
        d2 = (ii - si) ** 2 + (jj - sj) ** 2
        return jnp.where(seed_arr >= 0, d2, _BIG_I32)

    step = 1
    steps = [1]  # leading step-1 pass: see ops/pallas/jfa.py _jfa_steps
    while step < max(H, W):
        step <<= 1
    while step >= 1:
        steps.append(step)
        step >>= 1
    steps.append(1)  # JFA+1 refinement pass

    # Jacobi schedule: every pass takes all 8 neighbor candidates from the
    # PASS-START seed (the textbook JFA), so the row-tiled Pallas kernel
    # (ops/pallas/jfa.py, halo = step) is bit-identical to this path.
    for s in steps:
        prev = seed
        best_d2 = d2_of(prev)
        for di in (-s, 0, s):
            for dj in (-s, 0, s):
                if di == 0 and dj == 0:
                    continue
                ns = _shift_i(prev, di, dj, fill=-1)
                cand_d2 = d2_of(ns)
                better = cand_d2 < best_d2
                seed = jnp.where(better, ns, seed)
                best_d2 = jnp.where(better, cand_d2, best_d2)

    return jnp.sqrt(d2_of(seed).astype(jnp.float32))


def minmax_norm01(d):
    """cv2.normalize(..., 0, 1.0, NORM_MINMAX): to [0,1]; all-equal inputs -> zeros."""
    mn = d.min()
    mx = d.max()
    rng = mx - mn
    return jnp.where(rng > 0, (d - mn) / jnp.where(rng > 0, rng, 1.0), 0.0)


def get_distance_label(label_hwc):
    """Multitask distance label from a one-hot label (H, W, C): per-channel precise
    EDT + min-max normalization to [0,1] — on-device equivalent of
    multitasking_utils.py:26-35. On TPU this uses the VMEM-resident Pallas JFA
    kernel (ops/pallas/jfa.py, bit-identical to the XLA path and ~2x faster);
    set RESUNETA_NO_PALLAS=1 to force the XLA implementation."""
    import os

    chan_first = jnp.moveaxis(label_hwc, -1, 0)
    # default on TPU (2.1x the XLA JFA, bit-identical); RESUNETA_NO_PALLAS opts out
    use_pallas = not os.environ.get("RESUNETA_NO_PALLAS")
    if use_pallas:
        from .pallas.jfa import (pallas_available, tiled_available,
                                 distance_transform_edt_pallas,
                                 distance_transform_edt_pallas_tiled)

        H, W = label_hwc.shape[0], label_hwc.shape[1]
        if pallas_available(H * W):
            dists = distance_transform_edt_pallas(chan_first)
        elif tiled_available(H, W):
            # >= 1024px planes: row-tiled band-DMA flood (same numerics)
            dists = distance_transform_edt_pallas_tiled(chan_first)
        else:
            dists = jax.vmap(distance_transform_edt)(chan_first)
    else:
        dists = jax.vmap(distance_transform_edt)(chan_first)
    dists = jax.vmap(minmax_norm01)(dists)
    return jnp.moveaxis(dists, 0, -1)
