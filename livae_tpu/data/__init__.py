from .datasets import (
    AdaptiveLatticeDataset,
    PairedAdaptiveLatticeDataset,
    PatchDataset,
    default_transform,
)
from .h5 import load_image_from_h5
from .pipeline import AugmentConfig, extract_batch, extract_batch_paired
