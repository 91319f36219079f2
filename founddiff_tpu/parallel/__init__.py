from founddiff_tpu.parallel.mesh import (
    batch_sharding,
    init_distributed,
    make_mesh,
    replicate_state,
    replicated,
    shard_batch,
)
from founddiff_tpu.parallel.sequence import seq_sharded_selective_scan

__all__ = [
    "batch_sharding",
    "init_distributed",
    "make_mesh",
    "replicate_state",
    "replicated",
    "seq_sharded_selective_scan",
    "shard_batch",
]
