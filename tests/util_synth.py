"""Synthetic dataset helpers for tests and CLI verification drives."""

import numpy as np

from resuneta_tpu.data import write_packed_dataset


def synth_patches(n=8, ps=64, channels=3, num_classes=5, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 256, (n, ps, ps, channels), dtype=np.uint8)
    ids = np.zeros((n, ps, ps), np.uint8)
    for i in range(n):
        for k in range(1, num_classes):
            r0, c0 = rng.integers(0, ps - 8, 2)
            dh, dw = rng.integers(4, ps // 2, 2)
            ids[i, r0:min(r0 + dh, ps), c0:min(c0 + dw, ps)] = k
    # paint the image to correlate with labels so tiny models can learn
    for k in range(num_classes):
        mask = ids == k
        base = np.array([40 * k % 256, (60 * k + 30) % 256, (90 * k + 70) % 256])
        for c in range(min(channels, 3)):
            images[..., c] = np.where(mask, base[c], images[..., c])
    return images, ids


def make_packed(tmpdir, n=8, ps=64, channels=3, num_classes=5, data_aug=True, seed=0):
    images, ids = synth_patches(n, ps, channels, num_classes, seed)
    write_packed_dataset(str(tmpdir), images, ids, num_classes,
                         norm_type=1, data_aug=data_aug)
    return str(tmpdir)


def synth_scene(height=256, width=320, channels=3, num_classes=5, seed=0):
    """A fake ISPRS-style scene: RGB image + RGB-coded reference."""
    rng = np.random.default_rng(seed)
    ids = np.zeros((height, width), np.uint8)
    for k in range(1, num_classes):
        for _ in range(4):
            r0, c0 = rng.integers(0, height - 16), rng.integers(0, width - 16)
            dh, dw = rng.integers(8, 60, 2)
            ids[r0:min(r0 + dh, height), c0:min(c0 + dw, width)] = k
    image = rng.integers(0, 256, (height, width, channels), dtype=np.uint8)
    return image, ids
