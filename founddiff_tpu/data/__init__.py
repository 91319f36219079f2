from founddiff_tpu.data.datasets import (
    DOSE_DIRS,
    DoseDataset,
    Mayo16Dataset,
    PDFDataset,
    define_label,
    sorted_list,
)
from founddiff_tpu.data.loader import Loader, cycle
from founddiff_tpu.data.transforms import (
    Compose,
    Normalize,
    RandomFlip,
    RandomRotate90,
    ToArray,
    make_paired_transforms,
)

__all__ = [
    "Compose",
    "DOSE_DIRS",
    "DoseDataset",
    "Loader",
    "Mayo16Dataset",
    "Normalize",
    "PDFDataset",
    "RandomFlip",
    "RandomRotate90",
    "ToArray",
    "cycle",
    "define_label",
    "make_paired_transforms",
    "sorted_list",
]
