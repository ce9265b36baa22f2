"""Multi-host (DCN-analog) execution: a real 2-process jax.distributed
cluster on CPU (gloo) running the sharded universal trainer over a GLOBAL
4-device mesh, compared against the serial single-process engine
(SURVEY.md §2.6 "DCN" bullet; `parallel/multihost.py`).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcfa_tpu.attack.universal import (
    UniversalConfig,
    universal_batch_attack,
    universal_init,
)
from pcfa_tpu.data.synthetic import SyntheticDataset
from pcfa_tpu.models import make_model
from pcfa_tpu.parallel.multihost import process_shard

H = W = 32
N = 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_process_shard_balanced():
    assert process_shard(10, 0, 3) == [0, 1, 2, 3]
    assert process_shard(10, 1, 3) == [4, 5, 6]
    assert process_shard(10, 2, 3) == [7, 8, 9]
    assert sum((process_shard(7, p, 4) for p in range(4)), []) == list(range(7))


def test_two_process_universal_matches_serial(tmp_path):
    """Spawn a real 2-process cluster; its δ trajectory must equal the
    serial engine's on the same global batch."""
    port = _free_port()
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "_multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(p), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    res = np.load(tmp_path / "result.npz")

    # serial reference on the identical global batch
    model, _ = make_model("SpyNet", nlevels=3)
    x = jnp.zeros((1, H, W, 3))
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]

    def flow_fn(a, b):
        return model.apply({"params": params}, a, b)

    ds = SyntheticDataset(num_samples=N, size=(H, W), max_shift=2)
    x1 = jnp.asarray(
        np.stack([np.asarray(ds[i][0]) for i in range(N)]) / 255.0,
        jnp.float32)
    x2 = jnp.asarray(
        np.stack([np.asarray(ds[i][1]) for i in range(N)]) / 255.0,
        jnp.float32)
    target = jnp.zeros((N, H, W, 2), jnp.float32)

    cfg = UniversalConfig(steps=2, max_iter=2, delta_bound=0.01, mu=1000.0)
    opt, metrics, _, _ = jax.jit(
        lambda a, b, t, o: universal_batch_attack(flow_fn, a, b, t, o, cfg)
    )(x1, x2, target, universal_init((H, W, 3), cfg))

    # cross-host psum reassociates the reductions → tiny fp noise
    np.testing.assert_allclose(res["delta"], np.asarray(opt.x),
                               rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(res["loss"], np.asarray(metrics.loss),
                               rtol=1e-4, atol=1e-6)


def test_two_process_universal_cli(tmp_path):
    """The universal CLI end-to-end on a 2-process cluster: each host loads
    its dataset slice, the engine trains ONE global δ over the cross-host
    mesh, and both hosts write identical δ artifacts."""
    import glob

    port = _free_port()
    outs = []
    procs = []
    for p in range(2):
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("JAX_", "XLA_"))}
        env.update({
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PCFA_CPU": "1",
            "JAX_COORDINATOR_ADDRESS": f"localhost:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(p),
            "PCFA_SYNTHETIC_COUNT": "4",
            "PCFA_SYNTHETIC_SIZE": "64x64",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "attack_PCFA.py", "--net=SpyNet",
             "--dataset=Synthetic", "--dataset_stage=training",
             "--steps=1", "--epochs=1", "--batch_size=2",
             "--universal_perturbation", "--unregistered_artifacts",
             "--boxconstraint=clipping",
             f"--output_folder={tmp_path}/host{p}"],
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"CLI worker failed:\n{out[-3000:]}"
    assert any("2 host(s)" in o for o in outs)

    deltas = []
    for p in range(2):
        files = glob.glob(str(tmp_path / f"host{p}" / "**" / "*delta1_e0.npy"),
                          recursive=True)
        assert files, f"host {p} wrote no δ artifact"
        deltas.append(np.load(files[0]))
    np.testing.assert_array_equal(deltas[0], deltas[1])
