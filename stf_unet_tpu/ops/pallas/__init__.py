from stf_unet_tpu.ops.pallas.lstm_kernel import fused_lstm_last
from stf_unet_tpu.ops.pallas.lstm_train_kernel import fused_lstm_last_x

__all__ = ["fused_lstm_last", "fused_lstm_last_x"]
