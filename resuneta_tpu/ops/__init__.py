from .colorspace import rgb_to_hsv_cv2, hsv_to_rgb_cv2, hsv_color_label
from .normalize import (
    normalize_rgb,
    normalize_hsv,
    normalization,
    standard_scale,
    minmax_scale,
)
from .augment import augment5, augment_by_index, AUG_VARIANTS
from .boundary import get_boundary_label
from .distance import get_distance_label
from .patches import (
    extract_patches,
    extract_patches_nonoverlap,
    reconstruct_from_patches,
    num_patches_grid,
)
from . import morphology

__all__ = [
    "rgb_to_hsv_cv2",
    "hsv_to_rgb_cv2",
    "hsv_color_label",
    "normalize_rgb",
    "normalize_hsv",
    "normalization",
    "standard_scale",
    "minmax_scale",
    "augment5",
    "augment_by_index",
    "AUG_VARIANTS",
    "get_boundary_label",
    "get_distance_label",
    "extract_patches",
    "extract_patches_nonoverlap",
    "reconstruct_from_patches",
    "num_patches_grid",
    "morphology",
]
