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
    """1+JFA+1 schedule: the Jacobi flood needs the leading step-1 pass to seed
    region borders before the long jumps (without it ~0.1% of pixels in large
    blobs latch a suboptimal seed that the trailing +1 pass cannot fix —
    measured vs cv2 exact EDT on the blob-plane test corpus)."""
    step = 1
    while step < max(H, W):
        step <<= 1
    steps = [1]  # 1+JFA
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

    # Jacobi schedule (candidates from the pass-start seed) — bit-identical to
    # ops/distance.py and to the row-tiled kernel below
    for step in _jfa_steps(H, W):
        prev = seed
        best_d2 = d2_of(prev)
        for di in (-step, 0, step):
            for dj in (-step, 0, step):
                if di == 0 and dj == 0:
                    continue
                ns = _shift_fill(prev, di, dj, fill=-1)
                cand = d2_of(ns)
                better = cand < best_d2
                seed = jnp.where(better, ns, seed)
                best_d2 = jnp.where(better, cand, best_d2)

    out_ref[0] = jnp.sqrt(d2_of(seed).astype(jnp.float32))


# ---------------------------------------------------------------------------
# Row-tiled JFA for planes too large to pin in VMEM (>= 1024px patches).
#
# Key observation: a JFA pass at step s samples rows at EXACTLY {-s, 0, +s} —
# not the whole halo — so each grid program DMAs three tile-high row BANDS
# (VMEM = 3*tile*W int32, independent of s) from the seed plane in HBM,
# computes the 9-candidate Jacobi min for its tile, and writes the tile of the
# next seed plane. One pallas_call per pass; the seed plane round-trips HBM
# between passes (inherent to tiling). Out-of-plane rows come from a -1-padded
# copy of the seed (pad = largest step < H), so band slices never clamp and
# out-of-plane candidates are invalid automatically — bit-identical to the
# small kernel above and to ops/distance.py.
# ---------------------------------------------------------------------------

def _pass_offsets(H, W, s):
    """Static candidate offsets of a pass: row bands and column shifts."""
    dis = (-s, 0, s) if s < H else (0,)
    djs = (-s, 0, s) if s < W else (0,)
    return dis, djs


def _band_layout(dis, tile):
    """Per-band (dma remainder, window rows, buffer row offset) — all static.

    A band's DMA row start t*tile + halo + di is 8-sublane-aligned except when
    |di| = s < 8 (the JFA schedule's s in {1, 2, 4}): an UNALIGNED start
    crashes this toolchain's remote Mosaic compile helper outright (exit 1,
    bisected pass-by-pass on hardware — BENCH_NOTES round 5), so those bands
    fetch tile + 8 rows from the aligned floor (start - di%8) and roll the
    remainder off in VMEM (native i32 sublane rotate, same op the VMEM-
    resident kernel's _shift_fill uses)."""
    rems = [di % 8 for di in dis]
    wins = [tile + (8 if r else 0) for r in rems]
    offs = [sum(wins[:k]) for k in range(len(wins))]
    return rems, wins, offs


def _edt_pass_kernel(prev_hbm, out_ref, buf, sem, *, H, W, s, tile, halo):
    n = pl.program_id(0)
    t = pl.program_id(1)
    dis, djs = _pass_offsets(H, W, s)
    rems, wins, offs = _band_layout(dis, tile)

    for k, di in enumerate(dis):
        copy = pltpu.make_async_copy(
            prev_hbm.at[n, pl.ds(t * tile + halo + di - rems[k], wins[k]), :],
            buf.at[pl.ds(offs[k], wins[k]), :], sem)
        copy.start()
        copy.wait()

    ii = jax.lax.broadcasted_iota(jnp.int32, (tile, W), 0) + t * tile
    jj = jax.lax.broadcasted_iota(jnp.int32, (tile, W), 1)

    def d2_of(sd):
        si = sd // W
        sj = sd - si * W
        d2 = (ii - si) ** 2 + (jj - sj) ** 2
        return jnp.where(sd >= 0, d2, _BIG_I32)

    def band(k):
        """Rows [rem, rem + tile) of band k's fetched window: roll the
        aligned-floor fetch up by rem (wrapped tail rows land past row
        `tile` and are sliced away)."""
        w = buf[pl.ds(offs[k], wins[k]), :]
        if rems[k]:
            w = pltpu.roll(w, (-rems[k]) % wins[k], axis=0)
            w = w[:tile, :]
        return w

    cur = band(dis.index(0))
    best_seed = cur
    best_d2 = d2_of(cur)
    for k, di in enumerate(dis):
        rows = band(k)
        for dj in djs:
            if di == 0 and dj == 0:
                continue
            ns = rows
            if dj % W:
                ns = pltpu.roll(ns, (-dj) % W, axis=1)
                valid = (jj + dj >= 0) & (jj + dj < W)
                ns = jnp.where(valid, ns, -1)
            cand = d2_of(ns)
            better = cand < best_d2
            best_seed = jnp.where(better, ns, best_seed)
            best_d2 = jnp.where(better, cand, best_d2)
    out_ref[0] = best_seed


def _pick_tile(H):
    for tile in (256, 128, 64, 32, 16, 8):
        if H % tile == 0:
            return tile
    return None


def tiled_available(H, W):
    """Row-tiled path preconditions: TPU pallas, lane-aligned W, tileable H."""
    return (_PALLAS_OK and jax.default_backend() == "tpu"
            and W % 128 == 0 and _pick_tile(H) is not None)


def _tiled_impl(planes, tile, interpret):
    """Single-call row-tiled flood over (N, H, W) planes (see the public
    wrapper below for the batching story)."""
    N, H, W = planes.shape
    x = planes != 0
    ii = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    seed = jnp.where(~x, ii[None] * W + jj[None], -1)

    steps = [s for s in _jfa_steps(H, W) if s < H or s < W]
    halo = max([s for s in steps if s < H], default=0)
    for s in steps:
        padded = jnp.pad(seed, ((0, 0), (halo, halo), (0, 0)),
                         constant_values=-1)
        kernel = functools.partial(_edt_pass_kernel, H=H, W=W, s=s, tile=tile,
                                   halo=halo)
        seed = pl.pallas_call(
            kernel,
            grid=(N, H // tile),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, tile, W), lambda n, t: (n, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, H, W), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((sum(_band_layout(_pass_offsets(H, W, s)[0],
                                             tile)[1]), W), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(padded)

    si = seed // W
    sj = seed - si * W
    d2 = jnp.where(seed >= 0, (ii[None] - si) ** 2 + (jj[None] - sj) ** 2,
                   _BIG_I32)
    return jnp.sqrt(d2.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _tiled_vmapped(tile, interpret):
    """custom_vmap wrapper for the row-tiled flood.

    The train pipeline (data/pipeline.py) vmaps label generation over the
    batch. jax.vmap's DEFAULT batching rule for pallas_call prepends a grid
    axis and a batch index to every operand's index_map — but this kernel's
    seed plane is a memory-space-ANY operand whose row bands are DMA'd
    manually, and Mosaic rejects a blocked ANY operand with a non-trivial
    index_map (the round-4 `train_1024px` ValueError, VERDICT.md). The fix is
    structural: a custom_vmap rule that FOLDS the mapped axis into the
    kernel's own leading plane grid (batch x channel planes are independent),
    so no batched pallas_call ever reaches the lowering — and the compiled
    program is the same one the unbatched tests pin."""

    @jax.custom_batching.custom_vmap
    def f(planes):
        return _tiled_impl(planes, tile, interpret)

    @f.def_vmap
    def _rule(axis_size, in_batched, planes):
        (batched,) = in_batched
        if not batched:
            return f(planes), False
        B, N = planes.shape[0], planes.shape[1]
        out = f(planes.reshape((B * N,) + planes.shape[2:]))
        return out.reshape((B, N) + out.shape[1:]), True

    return f


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def distance_transform_edt_pallas_tiled(planes, tile=None, interpret=False):
    """EDT over (N, H, W) binary planes via row-tiled jump flooding — the
    >= 1024px path (the VMEM-resident kernel covers smaller planes). Numerics
    identical to distance_transform_edt_pallas / ops/distance.py. Safe under
    jax.vmap (the fused train pipeline maps label generation over the batch):
    a custom_vmap rule folds mapped axes into the plane grid."""
    tile = tile or _pick_tile(planes.shape[-2])
    return _tiled_vmapped(tile, bool(interpret))(planes)


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
