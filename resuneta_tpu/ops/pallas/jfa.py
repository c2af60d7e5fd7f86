"""Pallas TPU kernel: jump-flooding Euclidean distance transform.

The XLA version (ops/distance.py) materializes the seed array in HBM between the
~10 JFA passes x 8 neighbor updates. This kernel pins one (H, W) int32 seed plane
in VMEM for the whole flood — every pass is VPU work on on-chip data, HBM is
touched exactly twice (load mask, store distances). Grid = one program per
(batch x channel) plane; 256x256 int32 = 256 KB per plane, well inside VMEM.

Numerics are identical to ops/distance.py (exact int32 squared distances,
JFA+1 schedule), so the cv2 parity tests apply to both paths.
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

_BIG_I32 = 2 ** 30  # python literal: pallas kernels must not capture traced constants


# ~6 concurrent (H, W) int32 temporaries in VMEM; stay under the ~16 MB scoped
# budget with headroom (1024x1024 planes measured fine at 512; cap conservatively).
MAX_PLANE_ELEMS = 768 * 768


def pallas_available(plane_elems=0):
    return (_PALLAS_OK and jax.default_backend() == "tpu"
            and plane_elems <= MAX_PLANE_ELEMS)


def _shift_fill(arr, di, dj, fill):
    """out[i, j] = arr[i+di, j+dj], out-of-bounds -> fill.

    Implemented as circular rolls + an iota mask: Mosaic supports lane/sublane
    rotations natively, whereas pad+offset-slice hits 'result/input offset
    mismatch on non-concat dimension'."""
    H, W = arr.shape
    out = arr
    if di % H:
        out = pltpu.roll(out, (-di) % H, axis=0)
    if dj % W:
        out = pltpu.roll(out, (-dj) % W, axis=1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    valid = (ii + di >= 0) & (ii + di < H) & (jj + dj >= 0) & (jj + dj < W)
    return jnp.where(valid, out, fill)


def _jfa_steps(H, W):
    step = 1
    while step < max(H, W):
        step <<= 1
    steps = []
    while step >= 1:
        steps.append(step)
        step >>= 1
    steps.append(1)  # JFA+1
    return steps


def _edt_kernel(in_ref, out_ref, *, H, W):
    x = in_ref[0] != 0
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    seed = jnp.where(~x, ii * W + jj, -1)

    def d2_of(s):
        si = s // W
        sj = s - si * W
        d2 = (ii - si) ** 2 + (jj - sj) ** 2
        return jnp.where(s >= 0, d2, _BIG_I32)

    for step in _jfa_steps(H, W):
        best_d2 = d2_of(seed)
        for di in (-step, 0, step):
            for dj in (-step, 0, step):
                if di == 0 and dj == 0:
                    continue
                ns = _shift_fill(seed, di, dj, fill=-1)
                cand = d2_of(ns)
                better = cand < best_d2
                seed = jnp.where(better, ns, seed)
                best_d2 = jnp.where(better, cand, best_d2)

    out_ref[0] = jnp.sqrt(d2_of(seed).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def distance_transform_edt_pallas(planes, interpret: bool = False):
    """EDT over (N, H, W) binary planes (distance of nonzero pixels to the nearest
    zero), VMEM-resident jump flooding. Returns (N, H, W) float32."""
    N, H, W = planes.shape
    kernel = functools.partial(_edt_kernel, H=H, W=W)
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
