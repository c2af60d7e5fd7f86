"""Data augmentation: the reference's exactly-5 variants, on-device.

Reference (utils.py:69-95): variants are
  0: identity, 1: rot90, 2: rot180, 3: flip axis-0 (vertical), 4: flip axis-1 (horizontal)
— NOT rot270. np.rot90 rotates counter-clockwise in the (0, 1) plane.

On TPU these are pure relayouts (free relative to compute), so augmentation runs
inside the jitted input pipeline instead of being materialized to disk ×5 like the
reference does.
"""

import jax
import jax.numpy as jnp

AUG_VARIANTS = 5


def _rot90(x):
    # counter-clockwise like np.rot90(x, 1) on axes (0, 1)
    return jnp.flip(jnp.swapaxes(x, 0, 1), axis=0)


def _rot180(x):
    return jnp.flip(jnp.flip(x, axis=0), axis=1)


def _flip0(x):
    return jnp.flip(x, axis=0)


def _flip1(x):
    return jnp.flip(x, axis=1)


_FNS = [lambda x: x, _rot90, _rot180, _flip0, _flip1]


def augment_by_index(x, idx):
    """Apply augmentation variant `idx` (0..4, traced or static) to array x whose first
    two axes are spatial (H, W). Requires H == W for rot90 under jit (static shapes)."""
    return jax.lax.switch(idx, _FNS, x)


def augment5(image, labels):
    """All 5 variants of (image HWC, labels HW), stacked on a new leading axis —
    the on-device equivalent of utils.py:69-95 data_augmentation."""
    imgs = jnp.stack([f(image) for f in _FNS], axis=0)
    lbls = jnp.stack([f(labels) for f in _FNS], axis=0)
    return imgs, lbls
