from stf_unet_tpu.losses.dice import build_target, dice_coeff, multiclass_dice_coeff, dice_loss
from stf_unet_tpu.losses.criterion import criterion, cross_entropy

__all__ = [
    "build_target",
    "dice_coeff",
    "multiclass_dice_coeff",
    "dice_loss",
    "criterion",
    "cross_entropy",
]
