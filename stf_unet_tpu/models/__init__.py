from stf_unet_tpu.models.unet import UNet
from stf_unet_tpu.models.stf_lstm_unet import STFLSTMUNet
from stf_unet_tpu.models.registry import create_model, preprocess_input

__all__ = ["UNet", "STFLSTMUNet", "create_model", "preprocess_input"]
