"""On-device input pipeline: uint8 packed batch -> model-ready multitask batch,
fused into the jitted train step.

Replaces the reference's offline chain (x5 augmentation materialized to disk,
host-side OpenCV boundary/distance/HSV label generation, per-patch normalization —
preprocess_save_patches_ISPRS.py:197-228) with vmapped JAX run as part of the SAME
XLA program as the model: rot90/flips are relayouts, label generation is VPU
elementwise work, and only uint8 pixels+ids cross the host->HBM boundary.

Augmentation equivariance note: boundary/distance/HSV generation commute with the
5 reference variants (rot90/rot180/flips), so generating labels after on-device
augmentation is equivalent to the reference's augment-then-generate order.
"""


import jax
import jax.numpy as jnp

from ..ops.augment import augment_by_index
from ..ops.boundary import get_boundary_label
from ..ops.distance import get_distance_label
from ..ops.colorspace import hsv_color_label
from ..ops.normalize import normalize_rgb


def make_device_pipeline(num_classes: int, norm_type: int = 1,
                         multitasking: bool = True, color_head: bool = True):
    """Returns preprocess(raw_batch) for PackedDataset batches:
      raw: {'image_u8': (B,P,P,C) u8, 'label_ids': (B,P,P) u8, 'aug': (B,) i32}
      out: {'image': f32 normalized, 'seg': one-hot f32 [, 'bound','dist','color']}
    Pass it as `preprocess=` to make_train_step so it fuses into the step program.
    """

    def one_sample(img_u8, ids, aug_idx):
        img_u8 = augment_by_index(img_u8, aug_idx)
        ids = augment_by_index(ids, aug_idx)
        onehot = jax.nn.one_hot(ids, num_classes, dtype=jnp.float32)
        out = {
            "image": normalize_rgb(img_u8.astype(jnp.float32), norm_type),
            "seg": onehot,
        }
        if multitasking:
            out["bound"] = get_boundary_label(onehot)
            out["dist"] = get_distance_label(onehot)
            if color_head:
                out["color"] = hsv_color_label(img_u8, norm_type)
        return out

    def preprocess(raw):
        if "image_u8" not in raw:
            return raw  # legacy float batches pass through untouched
        return jax.vmap(one_sample)(raw["image_u8"], raw["label_ids"], raw["aug"])

    return preprocess


def make_label_head_pipeline():
    """On-device multitask label derivation for float batches that already carry
    {'image', 'seg' (one-hot)} — the Amazon multitask path
    (amazon_py/main_mabel_resuneta.py:152-167's get_boundary_labels /
    get_distance_labels, repaired: derived from the one-hot reference labels, not
    the image patches, and no HSV head on 14-channel input). Fuses into the jitted
    train step like make_device_pipeline."""

    def one_sample(onehot):
        return get_boundary_label(onehot), get_distance_label(onehot)

    def preprocess(raw):
        if "bound" in raw or "seg" not in raw:
            return raw
        bound, dist = jax.vmap(one_sample)(raw["seg"])
        out = dict(raw)
        out["bound"] = bound
        out["dist"] = dist
        return out

    return preprocess
