from vision_basedsensor_tpu.ops.ncc import normxcorr_gaussian
from vision_basedsensor_tpu.ops.dog import dog_area_mask
from vision_basedsensor_tpu.ops.peaks import find_peaks
from vision_basedsensor_tpu.ops.patches import extract_patches, patch_coords

__all__ = ["normxcorr_gaussian", "dog_area_mask", "find_peaks",
           "extract_patches", "patch_coords"]
