from stf_unet_tpu.train.schedule import warmup_poly_schedule
from stf_unet_tpu.train.early_stop import EarlyStopping
from stf_unet_tpu.train.state import TrainState, create_train_state
from stf_unet_tpu.train.loop import train_one_epoch, evaluate, make_train_step
from stf_unet_tpu.train.checkpoint import CheckpointManager

__all__ = [
    "warmup_poly_schedule",
    "EarlyStopping",
    "TrainState",
    "create_train_state",
    "train_one_epoch",
    "evaluate",
    "make_train_step",
    "CheckpointManager",
]
