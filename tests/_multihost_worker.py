"""Worker for tests/test_multihost.py: one process of a 2-process gloo CPU
cluster running a sharded universal-PCFA step over the GLOBAL (cross-host)
'data' mesh. Process 0 writes the resulting δ and loss trajectory to
`<outdir>/result.npz` for the test to compare against the serial engine.

Usage: python _multihost_worker.py <process_id> <port> <outdir>
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
outdir = sys.argv[3]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcfa_tpu.attack.universal import UniversalConfig, universal_init
from pcfa_tpu.data.synthetic import SyntheticDataset
from pcfa_tpu.models import make_model
from pcfa_tpu.parallel import universal_batch_attack_dp
from pcfa_tpu.parallel.multihost import (
    global_batch,
    global_data_mesh,
    initialize,
    process_shard,
)

H = W = 32
N = 4  # global batch = 4 pairs over 2 hosts x 2 devices

initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4

model, _ = make_model("SpyNet", nlevels=3)
x = jnp.zeros((1, H, W, 3))
params = model.init(jax.random.PRNGKey(0), x, x)["params"]


def flow_fn(a, b):
    return model.apply({"params": params}, a, b)


# every host builds the full (deterministic) dataset, loads only its shard
ds = SyntheticDataset(num_samples=N, size=(H, W), max_shift=2)
mine = process_shard(N)
x1_local = np.stack([np.asarray(ds[i][0]) for i in mine]) / 255.0
x2_local = np.stack([np.asarray(ds[i][1]) for i in mine]) / 255.0

mesh = global_data_mesh()
x1, x2 = global_batch(mesh, x1_local.astype(np.float32),
                      x2_local.astype(np.float32))
target = global_batch(mesh, np.zeros((len(mine), H, W, 2), np.float32))

cfg = UniversalConfig(steps=2, max_iter=2, delta_bound=0.01, mu=1000.0)
opt0 = universal_init((H, W, 3), cfg)
opt, metrics, _, _ = universal_batch_attack_dp(
    flow_fn, x1, x2, target, opt0, cfg, mesh
)

delta = np.asarray(jax.device_get(opt.x))
loss = np.asarray(jax.device_get(metrics.loss))
if pid == 0:
    np.savez(os.path.join(outdir, "result.npz"), delta=delta, loss=loss)
print(f"worker {pid}: OK", flush=True)
