"""Patch extraction / whole-image reconstruction.

The reference's spatial-tiling layer (its analog of sequence parallelism — see
SURVEY.md §2.3):
  - overlapping training patches via skimage view_as_windows
    (preprocess_save_patches_ISPRS.py:28-48, utils.py:287-300)
  - non-overlapping test chop (test_ISPRS.py:102-152, utils.py:402-437)
  - row-major reconstruction (test_ISPRS.py:48-87) and the Amazon scripts'
    column-major variant (utils.py:451-464)

Host-side extraction uses numpy stride tricks (zero-copy view, same math as
view_as_windows); the on-device variant builds the patch grid with a vmapped
dynamic-slice so a whole scene can be chopped in HBM and the grid sharded across
the device mesh for inference.
"""

import jax
import jax.numpy as jnp
import numpy as np


def num_patches_grid(height, width, patch_size, stride=None):
    """(n_rows, n_cols) of the patch grid; stride defaults to patch_size (non-overlap)."""
    stride = stride or patch_size
    return (height - patch_size) // stride + 1, (width - patch_size) // stride + 1


def extract_patches(image, reference, patch_size, stride):
    """Overlapping patch extraction for training — host-side, numpy stride tricks.

    image: (H, W, C), reference: (H, W). Returns
    (N, P, P, C) and (N, P, P) with N = n_rows * n_cols, row-major — identical
    ordering and contents to the reference's view_as_windows + reshape
    (preprocess_save_patches_ISPRS.py:28-48).
    """
    n_r, n_c = num_patches_grid(image.shape[0], image.shape[1], patch_size, stride)
    sh0, sh1, sh2 = image.strides
    win = np.lib.stride_tricks.as_strided(
        image,
        shape=(n_r, n_c, patch_size, patch_size, image.shape[2]),
        strides=(sh0 * stride, sh1 * stride, sh0, sh1, sh2),
        writeable=False,
    )
    rh0, rh1 = reference.strides
    win_ref = np.lib.stride_tricks.as_strided(
        reference,
        shape=(n_r, n_c, patch_size, patch_size),
        strides=(rh0 * stride, rh1 * stride, rh0, rh1),
        writeable=False,
    )
    patches = np.ascontiguousarray(win).reshape(n_r * n_c, patch_size, patch_size, -1)
    patches_ref = np.ascontiguousarray(win_ref).reshape(n_r * n_c, patch_size, patch_size)
    return patches, patches_ref


def extract_patches_nonoverlap(image, patch_size, order="row"):
    """Non-overlapping chop (stride = patch_size), truncating any remainder —
    test_ISPRS.py:102-152 semantics (order='row') and utils.py:402-437 extrac_patch2
    (order='col': outer loop over columns). Works for (H, W) and (H, W, C),
    numpy or jax arrays."""
    xp = jnp if isinstance(image, jnp.ndarray) else np
    H, W = image.shape[:2]
    n_h, n_w = H // patch_size, W // patch_size
    img = image[: n_h * patch_size, : n_w * patch_size]
    trail = img.shape[2:]
    grid = img.reshape((n_h, patch_size, n_w, patch_size) + trail)
    grid = xp.moveaxis(grid, 2, 1)  # (n_h, n_w, P, P, ...)
    if order == "col":
        grid = xp.swapaxes(grid, 0, 1)
    out = grid.reshape((n_h * n_w, patch_size, patch_size) + trail)
    return np.ascontiguousarray(out) if xp is np else out


def reconstruct_from_patches(patches, height, width, order="row"):
    """Row-major (test_ISPRS.py:48-87) or column-major (utils.py:451-464) whole-image
    reassembly of non-overlapping patches. patches: (N, P, P[, C]). Output is
    (n_h*P, n_w*P[, C]) — the truncated grid, like the reference."""
    xp = jnp if isinstance(patches, jnp.ndarray) else np
    P = patches.shape[1]
    n_h, n_w = height // P, width // P
    if order == "row":
        grid = patches.reshape((n_h, n_w) + patches.shape[1:])
    else:
        grid = patches.reshape((n_w, n_h) + patches.shape[1:])
        grid = xp.swapaxes(grid, 0, 1)
    if patches.ndim == 3:
        out = grid.transpose(0, 2, 1, 3).reshape(n_h * P, n_w * P)
    else:
        out = grid.transpose(0, 2, 1, 3, 4).reshape(n_h * P, n_w * P, -1)
    return out


def extract_patches_device(image, patch_size, stride):
    """On-device overlapping patch grid: (n_r*n_c, P, P, C) via vmapped dynamic_slice.
    image: jnp (H, W, C). Static shapes; the grid can then be sharded across the
    mesh for whole-scene inference."""
    n_r, n_c = num_patches_grid(image.shape[0], image.shape[1], patch_size, stride)
    rows = jnp.arange(n_r) * stride
    cols = jnp.arange(n_c) * stride
    C = image.shape[2]

    def slice_one(r, c):
        return jax.lax.dynamic_slice(image, (r, c, 0), (patch_size, patch_size, C))

    grid = jax.vmap(lambda r: jax.vmap(lambda c: slice_one(r, c))(cols))(rows)
    return grid.reshape(n_r * n_c, patch_size, patch_size, C)
