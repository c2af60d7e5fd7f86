from .sliding import (
    make_apply_fn,
    make_seg_ids_fn,
    predict_patches,
    predict_scene,
)

__all__ = ["make_apply_fn", "make_seg_ids_fn", "predict_patches", "predict_scene"]
