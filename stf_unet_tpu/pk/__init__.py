from stf_unet_tpu.pk.aif import population_aif, modified_aif, make_aif, auto_detect_aif
from stf_unet_tpu.pk.tofts import ToftsQuadrature, extended_tofts_batch
from stf_unet_tpu.pk.fit import fit_adam, fit_lm, preprocess_images, tissue_mask_morphology
from stf_unet_tpu.pk.maps import (
    fit_volume,
    process_patient,
    process_dataset,
    generate_pk_maps_for_dataset,
)

__all__ = [
    "population_aif",
    "modified_aif",
    "make_aif",
    "auto_detect_aif",
    "ToftsQuadrature",
    "extended_tofts_batch",
    "fit_adam",
    "fit_lm",
    "preprocess_images",
    "tissue_mask_morphology",
    "fit_volume",
    "process_patient",
    "process_dataset",
    "generate_pk_maps_for_dataset",
]
