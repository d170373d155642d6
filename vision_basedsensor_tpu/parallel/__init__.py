from vision_basedsensor_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_pipeline,
    shard_frames,
)

__all__ = ["make_mesh", "make_sharded_pipeline", "shard_frames"]
