from localmd_tpu.parallel.mesh import make_mesh, block_sharding, frame_sharding
from localmd_tpu.parallel.sharded import (
    sharded_block_decomposition,
    sharded_v_projection_chunk,
    sharded_gram_quadratic,
)

__all__ = [
    "make_mesh",
    "block_sharding",
    "frame_sharding",
    "sharded_block_decomposition",
    "sharded_v_projection_chunk",
    "sharded_gram_quadratic",
]
