from .jfa import distance_transform_edt_pallas, pallas_available
from .canny import boundary_label_pallas

__all__ = ["distance_transform_edt_pallas", "boundary_label_pallas",
           "pallas_available"]
