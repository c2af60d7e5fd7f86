"""Sliding-window whole-scene inference + reconstruction.

Reference flow (test_ISPRS.py:268-333): non-overlapping chop -> model.predict with
batch_size=1 (!) -> argmax -> row-major reconstruction -> metrics/RGB render.

TPU-native: patches are batched (large batches keep the MXU fed), the forward pass
is one jitted program, and with a mesh the PATCH GRID is sharded across devices —
patches are independent, so whole-scene inference scales linearly over ICI with no
halo exchange (SURVEY.md §2.3 "spatial parallelism").
"""

import jax
import numpy as np

from ..ops.patches import extract_patches_nonoverlap, reconstruct_from_patches
from ..parallel.mesh import shard_batch


def make_apply_fn(model, variables):
    """Jitted inference-mode forward."""
    @jax.jit
    def apply_fn(x):
        return model.apply(variables, x, train=False)
    return apply_fn


def predict_patches(apply_fn, patches, batch_size=32, mesh=None):
    """Run apply_fn over (N, P, P, C) patches in batches; pads the tail batch.
    Returns stacked outputs (dict of arrays for multitask, else array)."""
    n = patches.shape[0]
    if mesh is not None:
        # keep every batch divisible by the mesh axis
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        batch_size = max(batch_size // n_dev, 1) * n_dev
    outs = []
    for i in range(0, n, batch_size):
        chunk = patches[i:i + batch_size]
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
        chunk = np.ascontiguousarray(chunk, dtype=np.float32)
        if mesh is not None:
            chunk = shard_batch(chunk, mesh)
        out = apply_fn(chunk)
        out = jax.device_get(out)
        if pad:
            out = jax.tree_util.tree_map(lambda a: a[:-pad], out)
        outs.append(out)
    return jax.tree_util.tree_map(lambda *xs: np.concatenate(xs), *outs)


def predict_scene(apply_fn, image, patch_size, batch_size=32, mesh=None,
                  multitask=True):
    """Whole-scene segmentation: chop -> predict -> argmax -> reconstruct.
    Returns (class_map (H', W'), raw patch predictions)."""
    image = np.asarray(image)
    patches = extract_patches_nonoverlap(image, patch_size, order="row")
    preds = predict_patches(apply_fn, patches, batch_size, mesh)
    seg = preds["seg"] if multitask else preds
    seg_ids = np.argmax(seg, axis=-1)
    class_map = reconstruct_from_patches(
        seg_ids, image.shape[0], image.shape[1], order="row"
    )
    return np.asarray(class_map), preds
