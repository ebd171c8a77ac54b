from stf_unet_tpu.serve.engine import DynamicBatcher, InferenceEngine
from stf_unet_tpu.serve.http import SegmentationServer

__all__ = ["DynamicBatcher", "InferenceEngine", "SegmentationServer"]
