from imagegenerator_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    local_batch_size,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "local_batch_size"]
