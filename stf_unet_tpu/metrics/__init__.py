from stf_unet_tpu.metrics.confusion import (
    confusion_update,
    confusion_compute,
    confusion_report,
    format_confusion,
)
from stf_unet_tpu.metrics.dice import eval_dice_update
from stf_unet_tpu.metrics.binary import iou_score, compute_metrics
from stf_unet_tpu.metrics.meters import SmoothedValue, MetricLogger, AverageMeter

__all__ = [
    "confusion_update",
    "confusion_compute",
    "confusion_report",
    "format_confusion",
    "eval_dice_update",
    "iou_score",
    "compute_metrics",
    "SmoothedValue",
    "MetricLogger",
    "AverageMeter",
]
