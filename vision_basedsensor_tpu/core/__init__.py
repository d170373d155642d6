from vision_basedsensor_tpu.core.camera import CameraModel
from vision_basedsensor_tpu.core import transforms, imaging, fit

__all__ = ["CameraModel", "transforms", "imaging", "fit"]
