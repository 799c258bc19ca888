"""Multi-host distribution: process init, hybrid ICI x DCN meshes, and
the cross-host placement policy for each FHE parallelism axis.

The reference has NO distributed backend (SURVEY section 2.7: single
process + OpenMP, `utils/parallel.h:45`; multi-node exists only as the
protocol-level multiparty API).  This module is the first-class
TPU-native replacement: `jax.distributed` for process bootstrap and a
two-tier mesh where the fast intra-slice interconnect (ICI) carries the
collective-heavy axes and the slow data-center network (DCN) carries
only embarrassingly-parallel ones.

Placement policy (how SURVEY's P2/P5/P6/P7 map onto the two tiers):

  axis        collective load                    tier
  ----        ----------------                   ----
  batch (P2)  none (keys replicated once)        DCN  -- hosts
  limbs/digits (P5)  psum per key switch         ICI only
  coeff (P7)  all_to_all per NTT                 ICI only
  party (P6)  one psum per fusion                DCN ok (one round-trip
              per protocol step is the protocol's own latency floor)

`dryrun_multichip` exercises the single-process multi-device form of
all four; multi-process init is exposed here and smoke-tested in its
single-process degenerate form (jax.distributed with num_processes=1)."""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_processes(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> int:
    """Bootstrap multi-process JAX (one process per host).

    Arguments default from the standard env vars (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID) so launchers can stay generic; a no-arg,
    no-env call is the single-process degenerate form and skips
    jax.distributed entirely.  Returns the process count."""
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("PROCESS_ID", "0"))
    if num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return num_processes


@dataclasses.dataclass(frozen=True)
class FheMesh:
    """Two-tier mesh + the per-axis names the FHE layers shard over.

    mesh axes: (host, chip_batch, ici) where `host` crosses DCN,
    `chip_batch` is the per-host batch-parallel chip group, and `ici`
    is the per-host axis reserved for limb/digit/coefficient collectives.
    Any axis may be size 1."""
    mesh: Mesh

    @property
    def batch_axes(self) -> tuple[str, ...]:
        return ("host", "chip_batch")

    @property
    def ici_axis(self) -> str:
        return "ici"

    def batch_sharding(self, ndim: int = 1) -> NamedSharding:
        """Leading-axis batch sharding over host x chip_batch."""
        spec = P(self.batch_axes, *([None] * (ndim - 1)))
        return NamedSharding(self.mesh, spec)

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def make_fhe_mesh(ici_parallel: int = 1,
                  devices=None,
                  num_hosts: int | None = None) -> FheMesh:
    """Build the (host, chip_batch, ici) mesh.

    ici_parallel: chips per host dedicated to intra-primitive
    collectives (limb/digit psum, coefficient all_to_all); the rest of
    each host's chips become `chip_batch`.  On a real multi-host
    platform the host axis is taken from process placement
    (local_devices grouping); single-process runs split the flat device
    list into `num_hosts` equal groups so the DCN tier is testable on a
    virtual mesh."""
    devs = list(devices if devices is not None else jax.devices())
    if jax.process_count() > 1:
        hosts = jax.process_count()
    else:
        hosts = num_hosts or 1
    per_host = len(devs) // hosts
    if per_host == 0:
        raise ValueError(f"{len(devs)} devices cannot fill {hosts} hosts")
    if per_host % ici_parallel != 0:
        raise ValueError(f"ici_parallel={ici_parallel} must divide "
                         f"per-host device count {per_host}")
    chip_batch = per_host // ici_parallel
    arr = np.array(devs[:hosts * per_host]).reshape(
        hosts, chip_batch, ici_parallel)
    return FheMesh(mesh=Mesh(arr, ("host", "chip_batch", "ici")))


# ---------------------------------------------------------------------------
# Cross-host work distribution
# ---------------------------------------------------------------------------

def shard_gate_batch(fmesh: FheMesh, key, cts):
    """Replicate keys everywhere, shard the ciphertext batch over
    host x chip_batch (keys cross DCN exactly once at placement)."""
    key_r = jax.device_put(key, fmesh.replicated())
    cts_s = jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, fmesh.batch_sharding(leaf.ndim))
        if getattr(leaf, "ndim", 0) >= 1 else leaf, cts)
    return key_r, cts_s


def fusion_psum_spec(fmesh: FheMesh) -> tuple[Mesh, str]:
    """Where a multiparty fusion psum runs: over the host (DCN) axis --
    one reduction round-trip per protocol step, matching the protocol's
    own communication floor (rns-multiparty.cpp Lead/Main/Fusion)."""
    return fmesh.mesh, "host"


def as_batch_mesh(fmesh: FheMesh) -> Mesh:
    """Flatten host x chip_batch x ici into the 1-axis batch mesh the
    batch facade (parallel/batch.py) consumes, preserving device order
    so host-adjacent shards stay host-local."""
    devs = fmesh.mesh.devices.reshape(-1)
    return Mesh(devs, ("batch",))
