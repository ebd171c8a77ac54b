from stf_unet_tpu.data.index import DatasetIndex, SampleRecord
from stf_unet_tpu.data.loader import HostLoader, load_sample_raw
from stf_unet_tpu.data.transforms import (
    TrainAugment,
    eval_preprocess,
    normalize,
)
from stf_unet_tpu.data.synthetic import make_synthetic_breadm

__all__ = [
    "DatasetIndex",
    "SampleRecord",
    "HostLoader",
    "load_sample_raw",
    "TrainAugment",
    "eval_preprocess",
    "normalize",
    "make_synthetic_breadm",
]
