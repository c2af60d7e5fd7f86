from .dataset import (
    PackedDataset,
    LegacyPatchDataset,
    ArrayDataset,
    write_packed_dataset,
)
from .pipeline import make_device_pipeline, make_label_head_pipeline

__all__ = [
    "PackedDataset",
    "LegacyPatchDataset",
    "ArrayDataset",
    "write_packed_dataset",
    "make_device_pipeline",
    "make_label_head_pipeline",
]
