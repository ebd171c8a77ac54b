from stf_unet_tpu.metrics.confusion import (
    confusion_update,
    confusion_compute,
    confusion_report,
    format_confusion,
)
from stf_unet_tpu.metrics.dice import eval_dice_update
from stf_unet_tpu.metrics.binary import iou_score, compute_metrics
from stf_unet_tpu.metrics.meters import SmoothedValue, MetricLogger, AverageMeter
from stf_unet_tpu.metrics.surface import hd95_assd, surface_metrics
from stf_unet_tpu.metrics.patient import PatientAggregator, format_patient_report

__all__ = [
    "hd95_assd",
    "surface_metrics",
    "PatientAggregator",
    "format_patient_report",
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
