from vision_basedsensor_tpu.calibrate.homography import fit_homography
from vision_basedsensor_tpu.calibrate.zhang import ZhangResult, calibrate_intrinsics
from vision_basedsensor_tpu.calibrate.pnp import PnPResult, solve_pnp_ransac
from vision_basedsensor_tpu.calibrate.artifact import CalibrationArtifact

__all__ = ["fit_homography", "ZhangResult", "calibrate_intrinsics",
           "PnPResult", "solve_pnp_ransac", "CalibrationArtifact"]
