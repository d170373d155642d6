"""Host-side I/O: tabular artifacts (CSV/xlsx), video sources, schemas.

Submodules are imported directly (``from vision_basedsensor_tpu.io import
table``) to keep optional host dependencies (cv2 for video) lazy.
"""
