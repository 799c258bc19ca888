"""Batch-parallel execution over a device mesh.

The TPU-native replacement for the reference's OpenMP batch layer
(/root/reference/src/binfhe/lib/batch/batch.cpp BootstrapBatch:53,
EvalBinGateBatch:176) and the designed-but-unwired GPU batch backend
(backend/backend.h BlindRotateBatch:177): the ciphertext batch axis is
sharded across chips with `jax.sharding`, keys are replicated, and XLA
SPMD partitions the whole bootstrap pipeline (blind-rotation scan, MXU
NTT matmuls, key-switch gathers) with zero cross-chip collectives --
gate bootstrapping is embarrassingly parallel over the batch (SURVEY
SS2.7 P2).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return jax.make_mesh((n,), (axis,), devices=devs[:n])


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place every leaf with a leading batch dim on the mesh's batch axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
