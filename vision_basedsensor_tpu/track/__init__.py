from vision_basedsensor_tpu.track.rings import ReferenceMarkers, assign_identities, kmeans_1d
from vision_basedsensor_tpu.track.associate import (TrackedFrames, associate,
                                                    associate_sequential)

__all__ = ["ReferenceMarkers", "assign_identities", "kmeans_1d",
           "TrackedFrames", "associate", "associate_sequential"]
