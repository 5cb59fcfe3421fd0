"""Device mesh construction and sharding helpers.

Replaces the reference's NCCL/DDP layer (train.py:24-36, 203-204): instead of
a process group + gradient bucket all-reduce, we build a
``jax.sharding.Mesh`` over the slice and express data parallelism as sharded
array axes; the gradient all-reduce is a ``lax.pmean`` inside ``shard_map``
that XLA lowers to ICI collectives. Multi-host initialization goes through
``jax.distributed.initialize`` (torchrun-env equivalent) — on a TPU pod each
host sees only its local data shard, exactly like DistributedSampler
(train.py:59-60) but expressed by per-host slicing of the annotation CSV
(data/dataset.py shard arguments).

Axes:
  data   — batch parallelism (the only axis the reference capability needs)
  model  — reserved for tensor parallelism of the larger ViT variants
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model <= len(devices), (data, model, len(devices))
    devs = np.array(devices[:data * model]).reshape(data, model)
    return Mesh(devs, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, "data"))  # (accum, batch, ...)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(coordinator: Optional[str] = None):
    """Multi-host rendezvous (the jax.distributed analog of
    dist.init_process_group, reference train.py:35). No-op single-host."""
    if jax.process_count() > 1 or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator)
