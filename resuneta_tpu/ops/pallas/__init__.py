from .jfa import distance_transform_edt_pallas, pallas_available

__all__ = ["distance_transform_edt_pallas", "pallas_available"]
