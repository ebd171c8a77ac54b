from stf_unet_tpu.serve.client import SegmentationClient, ServerError
from stf_unet_tpu.serve.engine import DynamicBatcher, InferenceEngine
from stf_unet_tpu.serve.http import SegmentationServer
from stf_unet_tpu.serve.tiled import TiledPredictor

__all__ = ["DynamicBatcher", "InferenceEngine", "SegmentationClient",
           "SegmentationServer", "ServerError", "TiledPredictor"]
