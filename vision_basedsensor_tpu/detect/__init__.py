from vision_basedsensor_tpu.detect.detector import Detections, detect_markers

__all__ = ["Detections", "detect_markers"]
