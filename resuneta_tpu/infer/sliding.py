"""Sliding-window whole-scene inference + reconstruction.

Reference flow (test_ISPRS.py:268-333): non-overlapping chop -> model.predict with
batch_size=1 (!) -> argmax -> row-major reconstruction -> metrics/RGB render.

TPU-native: patches are batched (large batches keep the MXU fed), the forward pass
is one jitted program, and with a mesh the PATCH GRID is sharded across devices —
patches are independent, so whole-scene inference scales linearly over ICI with no
halo exchange (SURVEY.md §2.3 "spatial parallelism").
"""

from contextlib import nullcontext as _nullcontext

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.patches import extract_patches_nonoverlap, reconstruct_from_patches
from ..parallel.mesh import shard_batch, sharded_trace_scope


# ---- stable on-device post-processing heads (cache keys must be stable
# callables, not per-call lambdas, or the composed-jit cache never hits) ----

def seg_head(out):
    return out["seg"]


def identity_head(out):
    return out


def seg_probs_f32(out):
    return out["seg"].astype(jnp.float32)


def probs_f32(out):
    return out.astype(jnp.float32)


def seg_ids_u8(out):
    return jnp.argmax(out["seg"], axis=-1).astype(jnp.uint8)


def ids_u8(out):
    return jnp.argmax(out, axis=-1).astype(jnp.uint8)


def seg_ids_prob1(out):
    """Light-regime head for the Amazon whole-scene flow (utils.py:505-546):
    the eval only consumes the argmax class map and the class-1 probability
    plane, so reduce ON DEVICE — uint8 ids + f16 prob1 are ~8x less transfer
    than the full multitask f32 probability volumes."""
    seg = out["seg"] if isinstance(out, dict) else out
    return {"ids": jnp.argmax(seg, axis=-1).astype(jnp.uint8),
            "prob1": seg[..., 1].astype(jnp.float16)}


def seg_prob1_f16(out):
    seg = out["seg"] if isinstance(out, dict) else out
    return seg[..., 1].astype(jnp.float16)


_COMPOSED_CACHE = {}       # (apply_fn, device_post[, mesh]) -> composition
_COMPOSED_CACHE_MAX = 16   # strong refs key the cache, bounded FIFO eviction


def _cached(key, build):
    if key not in _COMPOSED_CACHE:
        if len(_COMPOSED_CACHE) >= _COMPOSED_CACHE_MAX:
            _COMPOSED_CACHE.pop(next(iter(_COMPOSED_CACHE)))
        _COMPOSED_CACHE[key] = build()
    return _COMPOSED_CACHE[key]


def _composed(apply_fn, device_post):
    """apply_fn followed by the on-device post head. Deliberately NOT re-jitted:
    production apply_fns are already jitted programs, the post head is a couple
    of cheap device dispatches on the output, and an outer jit would reject the
    plain-numpy apply_fns the compat tests drive with."""
    return _cached((apply_fn, device_post),
                   lambda: (lambda x: device_post(apply_fn(x))))


def _sharded_apply(apply_fn, mesh):
    """Patch-grid parallel inference on a pure data-parallel mesh: shard_map
    the (already jitted) forward over the 'data' axis so the fused eval
    kernels stay live per shard (GSPMD partitioning would trace them out —
    parallel/mesh.py). Patches are independent -> no collectives at all."""
    from jax.sharding import PartitionSpec as P

    def build():
        mapped = jax.shard_map(apply_fn, mesh=mesh, in_specs=P("data"),
                               out_specs=P("data"), check_vma=False)
        return jax.jit(mapped)

    return _cached((apply_fn, "shard_map", mesh), build)


def make_seg_ids_fn(model, variables, multitask=True, norm_type=None):
    """Jitted forward that returns uint8 class ids (argmax on device) — the
    minimal-transfer whole-scene path. With norm_type set, the input is raw
    uint8 pixels normalized on device (4x less host->device traffic)."""
    from ..ops.normalize import normalize_rgb

    @jax.jit
    def fn(x):
        if norm_type is not None:
            x = normalize_rgb(x.astype(jnp.float32), norm_type)
        out = model.apply(variables, x, train=False)
        seg = out["seg"] if multitask else out
        return jnp.argmax(seg, axis=-1).astype(jnp.uint8)
    return fn


def make_apply_fn(model, variables):
    """Jitted inference-mode forward."""
    @jax.jit
    def apply_fn(x):
        return model.apply(variables, x, train=False)
    return apply_fn


def predict_patches(apply_fn, patches, batch_size=32, mesh=None, device_post=None):
    """Run apply_fn over (N, P, P, C) patches in batches; pads the tail batch.
    Returns stacked outputs (dict of arrays for multitask, else array).

    device_post: optional reduction applied ON DEVICE before the device->host
    transfer (e.g. argmax to uint8 class ids) — whole-scene segmentation only
    needs ids, and transferring full multitask probability volumes dominates
    wall-clock on slow host links. The composed program is cached per
    (apply_fn, device_post) pair so repeated calls don't recompile."""
    n = patches.shape[0]
    pure_dp = mesh is not None and all(
        size == 1 for name, size in mesh.shape.items() if name != "data")
    if mesh is not None:
        # keep every batch divisible by the mesh axis
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        batch_size = max(batch_size // n_dev, 1) * n_dev
    if pure_dp:
        # shard the patch grid over 'data' with the fused kernels live
        apply_fn = _sharded_apply(apply_fn, mesh)
    if device_post is not None:
        apply_fn = _composed(apply_fn, device_post)
    outs = []
    for i in range(0, n, batch_size):
        chunk = patches[i:i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
        # keep the caller's dtype: uint8 patches upload 4x less than float32
        # (on-device normalization via make_seg_ids_fn(norm_type=...))
        chunk = np.ascontiguousarray(chunk)
        if mesh is not None:
            chunk = shard_batch(chunk, mesh)
        with sharded_trace_scope(mesh) if not pure_dp else _nullcontext():
            out = apply_fn(chunk)
        out = jax.device_get(out)
        if pad:
            out = jax.tree_util.tree_map(lambda a: a[:-pad], out)
        outs.append(out)
    return jax.tree_util.tree_map(lambda *xs: np.concatenate(xs), *outs)


def _grid_starts(extent, patch_size, stride):
    """Start offsets covering [0, extent) with the final window edge-clamped."""
    starts = list(range(0, extent - patch_size + 1, stride))
    if starts[-1] != extent - patch_size:
        starts.append(extent - patch_size)
    return starts


def predict_scene_overlap(apply_fn, image, patch_size, stride, batch_size=32,
                          mesh=None, multitask=True):
    """Overlap-averaged whole-scene segmentation — a quality option beyond the
    reference's non-overlap chop (test_ISPRS.py:268-333): windows are extracted
    every `stride` pixels, per-window softmax probabilities are accumulated
    into a scene canvas, and the class map is the argmax of the average. Patch
    seams (where the non-overlap chop shows blocking) get votes from every
    window covering them.

    The scene is cropped to patch_size multiples first, so stride == patch_size
    reproduces the reference chop semantics exactly. Without a mesh the
    accumulation runs on device (one jitted scatter-add program per batch, the
    canvas never leaves HBM); with a mesh the batched forward is sharded over
    devices and the accumulation folds on host.

    Returns (class_map (H', W') uint8, mean seg probabilities (H', W', C))."""
    image = np.asarray(image)
    Hc = image.shape[0] // patch_size * patch_size
    Wc = image.shape[1] // patch_size * patch_size
    image = image[:Hc, :Wc]

    positions = [(y, x) for y in _grid_starts(Hc, patch_size, stride)
                 for x in _grid_starts(Wc, patch_size, stride)]
    positions = np.asarray(positions, np.int32)
    patches = np.stack([image[y:y + patch_size, x:x + patch_size]
                        for y, x in positions])

    head = seg_head if multitask else identity_head

    if mesh is None:
        num_classes = None
        canvas = count = None
        prob_fn = _composed(apply_fn, head)

        @jax.jit
        def fold(canvas, count, probs, pos):
            def body(i, carry):
                cv, ct = carry
                y, x = pos[i, 0], pos[i, 1]
                blk = jax.lax.dynamic_slice(
                    cv, (y, x, 0), (patch_size, patch_size, cv.shape[-1]))
                cv = jax.lax.dynamic_update_slice(cv, blk + probs[i], (y, x, 0))
                cblk = jax.lax.dynamic_slice(ct, (y, x), (patch_size, patch_size))
                ct = jax.lax.dynamic_update_slice(ct, cblk + 1.0, (y, x))
                return cv, ct
            return jax.lax.fori_loop(0, probs.shape[0], body, (canvas, count))

        for i in range(0, len(patches), batch_size):
            chunk = jnp.asarray(np.ascontiguousarray(patches[i:i + batch_size]))
            probs = prob_fn(chunk).astype(jnp.float32)
            if canvas is None:
                num_classes = probs.shape[-1]
                canvas = jnp.zeros((Hc, Wc, num_classes), jnp.float32)
                count = jnp.zeros((Hc, Wc), jnp.float32)
            canvas, count = fold(canvas, count, probs,
                                 jnp.asarray(positions[i:i + batch_size]))
        mean = np.asarray(canvas / count[..., None])
    else:
        preds = predict_patches(apply_fn, patches, batch_size, mesh,
                                device_post=seg_probs_f32 if multitask
                                else probs_f32)
        canvas = np.zeros((Hc, Wc, preds.shape[-1]), np.float32)
        count = np.zeros((Hc, Wc), np.float32)
        for (y, x), p in zip(positions, preds):
            canvas[y:y + patch_size, x:x + patch_size] += p
            count[y:y + patch_size, x:x + patch_size] += 1.0
        mean = canvas / count[..., None]

    class_map = np.argmax(mean, axis=-1).astype(np.uint8)
    return class_map, mean


def predict_scene(apply_fn, image, patch_size, batch_size=32, mesh=None,
                  multitask=True, ids_only=False):
    """Whole-scene segmentation: chop -> predict -> argmax -> reconstruct.
    Returns (class_map (H', W'), raw patch predictions — or uint8 ids when
    ids_only, which argmaxes on device and transfers ~70x less data)."""
    image = np.asarray(image)
    patches = extract_patches_nonoverlap(image, patch_size, order="row")
    if ids_only:
        preds = predict_patches(apply_fn, patches, batch_size, mesh,
                                device_post=seg_ids_u8 if multitask else ids_u8)
        seg_ids = preds
    else:
        preds = predict_patches(apply_fn, patches, batch_size, mesh)
        seg = preds["seg"] if multitask else preds
        seg_ids = np.argmax(seg, axis=-1)
    class_map = reconstruct_from_patches(
        seg_ids, image.shape[0], image.shape[1], order="row"
    )
    return np.asarray(class_map), preds
