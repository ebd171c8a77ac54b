from stf_unet_tpu.ops.pallas.lstm_kernel import fused_lstm_sequence

__all__ = ["fused_lstm_sequence"]
