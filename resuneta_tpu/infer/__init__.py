from .sliding import make_apply_fn, predict_patches, predict_scene

__all__ = ["make_apply_fn", "predict_patches", "predict_scene"]
