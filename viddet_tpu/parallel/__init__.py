from viddet_tpu.parallel.mesh import (
    DATA_AXIS,
    initialize_distributed,
    make_mesh,
    shard_batch,
    replicate,
)

__all__ = ["DATA_AXIS", "initialize_distributed", "make_mesh", "shard_batch", "replicate"]
