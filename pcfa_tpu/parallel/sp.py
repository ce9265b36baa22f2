"""Spatial (context-parallel analog) sharding of the correlation volume.

SURVEY.md §2.6/§5: the one "long-context"-shaped scaling pressure in this
domain is RAFT/GMA's all-pairs correlation volume, O(N²) in N = H·W/64
positions (`raft/corr.py:52-60`) — ~220 MB at KITTI size and growing
quartically with frame side. This module shards that volume's FIRST N axis
over a `Mesh` axis named 'space':

* each device builds only its row shard `⟨f1_rows, f2⟩` (f2 replicated —
  at these sizes an all_gather'd f2 is a few MB; a `ppermute` ring is the
  drop-in upgrade for when f2 itself outgrows a chip),
* the per-iteration window lookup runs on the local coordinate rows
  against the local pyramid shard (`corr_lookup_mm`, gather-free),
* one tiled `all_gather` per iteration re-assembles the (small) corr
  features (B, H/8, W/8, levels·(2r+1)²) for the replicated GRU update.

Volume memory per device drops D×; encoders and the GRU stay replicated
(they are HBM-light). The wrapped function returns the full flow with the
output rows declared sharded (`P(None, 'space')`), so `jax.grad` through
`shard_map` transposes every collective correctly — validated against the
serial model in tests/test_parallel.py on the virtual 8-device CPU mesh.
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def space_mesh(num_devices: int | None = None) -> Mesh:
    """1-D mesh over devices, axis name 'space'."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("space",))


def spatial_flow_fn(
    model, params, mesh: Mesh
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Volume-sharded flow function `(x1, x2) → flow_up` for a RAFT-family
    Flax module constructed with `spatial_axis='space'` and
    `spatial_shards=mesh.shape['space']`.

    Inputs are replicated; the returned flow is the full field (assembled
    from per-device row shards). Compose with the PCFA engine like any
    other flow_fn — gradients flow through the shard_map."""
    n_dev = mesh.shape["space"]

    def inner(prm, x1, x2):
        out = model.apply({"params": prm}, x1, x2)
        flow = out[-1] if isinstance(out, tuple) else out
        hs = flow.shape[1] // n_dev
        r0 = jax.lax.axis_index("space") * hs
        return jax.lax.dynamic_slice_in_dim(flow, r0, hs, axis=1)

    fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=P(None, "space"),
    )
    shards = getattr(model, "spatial_shards", n_dev)

    def checked(x1, x2):
        H = x1.shape[1]
        if H % n_dev:
            raise ValueError(
                f"spatial sharding needs image height divisible by the "
                f"'space' mesh size: H={H}, devices={n_dev}. Pad H to a "
                f"multiple of {n_dev} (on top of the model's pad divisor)."
            )
        if (H // 8) % shards:
            raise ValueError(
                f"RAFT-family spatial sharding slices the H/8 feature rows: "
                f"H/8={H // 8} must be divisible by spatial_shards={shards} "
                f"(H={H}). Pad H to a multiple of {8 * shards}."
            )
        return fn(params, x1, x2)

    return checked
