"""vision_basedsensor_tpu — TPU-native vision-based tactile sensor framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
UPM-ROB-Lab/Vision-basedSensor (embedded vision-based tactile sensor for
bonnet polishing): batched marker detection, identity tracking, monocular 3D
displacement-field reconstruction, contact-force distribution and
pose-misalignment (tilt) estimation, plus camera calibration, synthetic data
generation, host I/O, and an acquisition/streaming server.

Architecture (see SURVEY.md §7): the reference's five file-coupled scripts
become one jitted array program over batched frames with fixed shapes and
validity masks; host shells handle video decode and artifacts.
"""

__version__ = "0.1.0"

from vision_basedsensor_tpu.config import PipelineConfig
from vision_basedsensor_tpu import layout

__all__ = ["PipelineConfig", "layout", "__version__"]
