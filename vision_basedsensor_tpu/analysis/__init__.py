from vision_basedsensor_tpu.analysis.force import (
    DeviationAnalysis,
    analyze_deviation,
    deviation_field,
    start_end_displacement,
)
from vision_basedsensor_tpu.analysis.series import displacement_statistics

__all__ = ["DeviationAnalysis", "analyze_deviation", "deviation_field",
           "start_end_displacement", "displacement_statistics"]
