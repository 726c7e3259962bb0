from surel_plus_tpu.parallel.dist import (
    make_mesh,
    shard_spg,
    DistributedTrainStep,
)

__all__ = ["make_mesh", "shard_spg", "DistributedTrainStep"]
