"""Batch-parallel execution over a device mesh + the batch API facade.

The TPU-native replacement for the reference's OpenMP batch layer
(/root/reference/src/binfhe/lib/batch/batch.cpp BootstrapBatch:53,
EvalFuncBatch:106, EvalBinGateBatch:176, BootstrapBatchAsync:320; API
binfhe-batch.h:19-60 -- BatchFlags, BatchResult) and the
designed-but-unwired GPU batch backend (backend/backend.h
BlindRotateBatch:177):

* the ciphertext batch axis is sharded across chips with `jax.sharding`,
  keys are replicated, and XLA SPMD partitions the whole bootstrap
  pipeline (blind-rotation scan, MXU NTT matmuls, key-switch gathers)
  with zero cross-chip collectives -- gate bootstrapping is
  embarrassingly parallel over the batch (SURVEY SS2.7 P2);
* ASYNC comes for free from JAX's asynchronous dispatch -- the batch
  calls return undispatched device futures; BatchFuture.result() blocks.
"""

from __future__ import annotations

import dataclasses
import enum

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class BatchFlags(enum.IntFlag):
    """binfhe-batch.h:19-26.  GPU_PREFER/CPU_FORCE map to TPU/CPU
    backends here; INPLACE is meaningless for immutable jax arrays and
    accepted as a no-op."""
    DEFAULT = 0
    ASYNC = 1 << 0
    INPLACE = 1 << 1
    NO_BOOTSTRAP = 1 << 2
    TPU_PREFER = 1 << 3
    CPU_FORCE = 1 << 4


@dataclasses.dataclass
class BatchResult:
    """binfhe-batch.h:29-34."""
    success: bool
    processed: int
    failed: int = 0
    error: str = ""


@dataclasses.dataclass
class BatchFuture:
    """Async handle: the device computation is already in flight
    (JAX dispatches eagerly); result() blocks until completion."""
    value: object

    def result(self):
        jax.block_until_ready(jax.tree.leaves(self.value))
        return self.value

    def done(self) -> bool:
        try:
            for leaf in jax.tree.leaves(self.value):
                if hasattr(leaf, "is_ready") and not leaf.is_ready():
                    return False
            return True
        except Exception:
            return True


# ---------------------------------------------------------------------------
# mesh / sharding helpers
# ---------------------------------------------------------------------------

def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    # Auto axis type: let XLA SPMD propagate shardings through the
    # jitted pipeline (explicit sharding-in-types would demand
    # out_sharding annotations on every gather/scatter)
    return jax.make_mesh((n,), (axis,), devices=devs[:n],
                         axis_types=(jax.sharding.AxisType.Auto,))


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place every leaf with a leading batch dim on the mesh's batch axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


# ---------------------------------------------------------------------------
# batch API facade (BootstrapBatch / EvalBinGateBatch / EvalFuncBatch)
# ---------------------------------------------------------------------------

def _maybe_async(out, flags: BatchFlags):
    if flags & BatchFlags.ASYNC:
        return BatchFuture(out)
    jax.block_until_ready(jax.tree.leaves(out))
    return out


def _batch_size(ct) -> int:
    return int(np.prod(ct.batch_shape)) if ct.batch_shape else 1


def bootstrap_batch(ctx, key, cts, flags: BatchFlags = BatchFlags.DEFAULT,
                    mesh: Mesh | None = None):
    """BootstrapBatch (batch.cpp:53): refresh a whole ciphertext batch.
    Returns (result_or_future, BatchResult)."""
    n = _batch_size(cts)
    if flags & BatchFlags.NO_BOOTSTRAP:
        return cts, BatchResult(True, n)
    if mesh is not None:
        key = replicate(key, mesh)
        cts = shard_batch(cts, mesh)
    try:
        out = ctx.bootstrap(key, cts)
        return _maybe_async(out, flags), BatchResult(True, n)
    except Exception as e:              # partial-failure reporting
        return None, BatchResult(False, 0, n, str(e))


def eval_bin_gate_batch(ctx, key, gate, cts1, cts2,
                        flags: BatchFlags = BatchFlags.DEFAULT,
                        mesh: Mesh | None = None):
    """EvalBinGateBatch (batch.cpp:176)."""
    n = _batch_size(cts1)
    if mesh is not None:
        key = replicate(key, mesh)
        cts1 = shard_batch(cts1, mesh)
        cts2 = shard_batch(cts2, mesh)
    try:
        out = ctx.eval_bin_gate(key, gate, cts1, cts2)
        return _maybe_async(out, flags), BatchResult(True, n)
    except Exception as e:
        return None, BatchResult(False, 0, n, str(e))


def eval_func_batch(ctx, key, cts, lut,
                    flags: BatchFlags = BatchFlags.DEFAULT,
                    mesh: Mesh | None = None):
    """EvalFuncBatch (batch.cpp:106): LUT bootstrap over a batch."""
    n = _batch_size(cts)
    if mesh is not None:
        key = replicate(key, mesh)
        cts = shard_batch(cts, mesh)
    try:
        out = ctx.eval_func(key, cts, lut)
        return _maybe_async(out, flags), BatchResult(True, n)
    except Exception as e:
        return None, BatchResult(False, 0, n, str(e))
