"""Multi-host initialization and mesh construction.

The reference has no distributed backend at all (SURVEY.md §2c — cluster use
is embarrassingly-parallel SLURM jobs); this module is the first-class
replacement for multi-chip / multi-host TPU:

  * ``initialize()`` wraps ``jax.distributed.initialize`` for multi-host
    pods (no-op on a single process);
  * ``forest_mesh`` builds the device mesh for the sharded forest with the
    ICI/DCN split made explicit: the ``shard`` axis (forest shards, heavy
    all_gather traffic at query time) is laid out over devices *within* a
    host slice so candidate merges ride ICI; an optional ``replica`` axis
    spans hosts over DCN for corpus replication / query fan-out, which only
    carries (B, k) merged candidates.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX.  Safe to call on a single host (no-op when
    no coordinator is configured).

    Environment contract (what the launcher's ``slurm-multihost`` scripts
    export — bench/launcher.write_multihost_slurm_script): explicit args
    win; otherwise ``JAX_COORDINATOR_ADDRESS`` +
    ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` (falling back to SLURM's
    ``SLURM_NTASKS``/``SLURM_PROCID`` for the per-task values srun sets).
    """
    import os

    env = os.environ
    coordinator_address = coordinator_address or \
        env.get("JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single-process

    def _int(*names):
        for n in names:
            if env.get(n):
                return int(env[n])
        return None

    if num_processes is None:
        num_processes = _int("JAX_NUM_PROCESSES", "SLURM_NTASKS")
    if process_id is None:
        process_id = _int("JAX_PROCESS_ID", "SLURM_PROCID")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def forest_mesh(shards_per_host: Optional[int] = None,
                shard_axis: str = "shard",
                replica_axis: str = "replica") -> Mesh:
    """Mesh for the sharded forest.

    Single host: 1D mesh over all local devices (pure ICI).
    Multi host: (replica=hosts, shard=devices-per-host) so the per-query
    candidate all_gather stays within a host's ICI domain and only the
    final merged top-k crosses DCN.
    """
    devs = jax.devices()
    n_local = len(jax.local_devices())
    n_hosts = max(1, len(devs) // max(n_local, 1))
    shards = shards_per_host or n_local
    if n_hosts == 1:
        return Mesh(np.asarray(devs[:shards]), (shard_axis,))
    grid = np.asarray(devs).reshape(n_hosts, n_local)[:, :shards]
    return Mesh(grid, (replica_axis, shard_axis))


def local_shard_count(mesh: Mesh, shard_axis: str = "shard") -> int:
    return mesh.shape[shard_axis]
