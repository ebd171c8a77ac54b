from stf_unet_tpu.utils.torch_import import (
    strip_module_prefix,
    conv_weight_to_hwio,
    convt_weight_to_hwio,
    import_unet_state_dict,
    import_stflstm_state_dict,
)
from stf_unet_tpu.utils.profiling import trace, annotate, JsonlLogger

__all__ = [
    "strip_module_prefix",
    "conv_weight_to_hwio",
    "convt_weight_to_hwio",
    "import_unet_state_dict",
    "import_stflstm_state_dict",
    "trace",
    "annotate",
    "JsonlLogger",
]
