"""Device mesh construction and sharding helpers.

The reference's only distribution strategy is torch-DDP data parallelism via
HF Accelerate/NCCL (reference src/DADiff.py:1546-1552, 1617-1622).  The TPU
equivalent: a ``jax.sharding.Mesh`` with a ``data`` axis (and a ``seq`` axis
for the sequence-sharded selective scan used in full-volume inference),
batch sharded over ``data``, parameters replicated, and XLA inserting the
gradient all-reduce over ICI — no hand-written collectives in the train
path.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    seq: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes ('data', 'seq').  ``data=None`` uses all devices on
    the data axis (divided by ``seq``)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % seq == 0, (n, seq)
        data = n // seq
    assert data * seq == n, f"mesh {data}x{seq} != {n} devices"
    arr = np.asarray(devices).reshape(data, seq)
    return Mesh(arr, ("data", "seq"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with its leading axis split over the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(state, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)


def init_distributed() -> None:
    """Multi-host initialization (the NCCL-rendezvous analogue).  No-op when
    running single-process."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
