"""Multi-host (DCN) execution: `jax.distributed` + per-host data sharding.

SURVEY.md §2.6: the reference has no distributed execution at all; the
TPU-native equivalent of "scale the dataset sweep beyond one host" is

  1. `initialize()` — one `jax.distributed.initialize` call per process
     (TPU pods auto-discover; explicit coordinator/process args or env vars
     elsewhere, e.g. CPU test clusters),
  2. a mesh spanning every process's devices (`global_data_mesh`) — the
     same 'data' axis the single-host engines use, so `shard_map` programs
     (`parallel/dp.py`) run unchanged: the universal-δ psum rides ICI
     within a host and DCN across hosts,
  3. per-host dataset shards (`process_shard`, wired into
     `data.loader.prepare_dataloader(process_shard=True)`): each host
     loads only its slice, and
  4. `global_batch` — assemble the per-host arrays into global
     `jax.Array`s batch-sharded over the global mesh
     (`jax.make_array_from_process_local_data`).

Per-pair PCFA attacks are embarrassingly parallel across hosts (no
collective at all); universal training is the one true multi-host program.
Verified by `tests/test_multihost.py` with a 2-process gloo CPU cluster.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Join (or form) the multi-process cluster. MUST run before anything
    that initializes the XLA backend (so this function never touches
    `jax.devices`/`jax.process_count` itself). No-op when already
    initialized, or when no coordinator is configured and the env provides
    no auto-discovery (single-process run). On TPU pods all arguments
    auto-discover; on CPU/GPU clusters pass them (or set
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    import os

    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:
        return  # already initialized
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # NOTE: deliberately no TPU_WORKER_HOSTNAMES auto-trigger — tunneled
    # single-chip environments carry stale pod env vars; multi-host runs
    # must set JAX_COORDINATOR_ADDRESS (or call with explicit args)
    if not coordinator_address:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def global_data_mesh() -> Mesh:
    """1-D 'data' mesh over ALL processes' devices, in process order (so a
    batch sharded by `global_batch` keeps each host's data on that host's
    devices — cross-host traffic is only the collectives)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), ("data",))


def process_shard(n: int,
                  process_index: int | None = None,
                  process_count: int | None = None) -> list[int]:
    """This host's dataset indices: contiguous, balanced split of range(n).

    Hosts with fewer samples simply finish their epoch earlier (the
    universal engine drops ragged batches host-locally either way)."""
    p = jax.process_index() if process_index is None else process_index
    c = jax.process_count() if process_count is None else process_count
    base, extra = divmod(n, c)
    start = p * base + min(p, extra)
    return list(range(start, start + base + (1 if p < extra else 0)))


def global_batch(mesh: Mesh, *host_local_arrays):
    """Per-host (B_local, ...) numpy/jax arrays → global jax.Arrays sharded
    P('data') over `mesh` (global batch = Σ hosts' local batches). Pass any
    number of arrays; returns them in order."""
    sharding = NamedSharding(mesh, P("data"))
    out = tuple(
        jax.make_array_from_process_local_data(sharding, np.asarray(a))
        for a in host_local_arrays
    )
    return out if len(out) != 1 else out[0]
