from vision_basedsensor_tpu.utils.profiling import StageTimer, trace_annotation
from vision_basedsensor_tpu.utils.log import get_logger

__all__ = ["StageTimer", "trace_annotation", "get_logger"]
