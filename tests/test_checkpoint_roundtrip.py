"""Checkpoint FILE-format round trips: shipped-format `.pth[.tar]` on disk
→ `runtime.load_model` → Flax params (VERDICT r2 item 4).

The per-net oracle tests validate the IN-MEMORY state-dict conversion
against the reference torch forward; what they do not touch is the on-disk
format the download scripts produce. Here we `torch.save` each net's
checkpoint in the exact shipped layout the reference loads
(`ownutilities.py:64-169`):

* RAFT / GMA — `torch.nn.DataParallel(model).state_dict()` saved raw, so
  every key carries the `module.` prefix (`ownutilities.py:105-107,122-124`)
* PWCNet — `{'state_dict': sd}` wrapper (the `'state_dict' in weights`
  branch, `ownutilities.py:136-140`)
* FlowNet2 — `{'state_dict': sd, 'epoch': …}` tarball-style checkpoint
  (`ownutilities.py:158-160`)
* SpyNet — per-conv-layer raw-tensor files
  `spynet_weights/modelL{level}_{F}-{conv}-{weight,bias}.pth.tar`
  (`SpyNet.py:77-81`)

and assert the file path produces EXACTLY the tree the (oracle-validated)
in-memory converter produces, that the msgpack cache round-trips bit-exact,
and — for the flagship RAFT — that the full `load_model → make_flow_fn`
chain matches the torch model that saved the file.
"""

import os
import sys
from argparse import Namespace

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from pcfa_tpu.models import make_model
from pcfa_tpu.models import convert as C
from pcfa_tpu import runtime

REF = "/root/reference"


def _tree_equal(a, b):
    ja, jb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(ja, jb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _load_twice(name, ckpt, tmp_path, monkeypatch):
    """load_model from the file, then again through the msgpack cache."""
    monkeypatch.chdir(tmp_path)  # cache lands in tmp models/_converted
    loaded = runtime.load_model(name, checkpoint=str(ckpt))
    cache = runtime._cache_path(name)
    assert os.path.exists(cache), "msgpack cache must be written"
    cached = runtime.load_model(name, checkpoint=str(ckpt))
    _tree_equal(loaded.params, cached.params)
    return loaded


def test_raft_dataparallel_pth_roundtrip(tmp_path, monkeypatch):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.raft.raft import RAFT as TorchRAFT

    torch.manual_seed(0)
    tm = TorchRAFT({"small": False, "mixed_precision": False, "dropout": 0,
                    "alternate_corr": False})
    with torch.no_grad():  # recurrent random-weight oracle damping
        tm.update_block.flow_head.conv2.weight *= 0.01
        tm.update_block.flow_head.conv2.bias *= 0.01
    tm.eval()

    # exact shipped format: DataParallel state_dict ('module.' keys) saved raw
    ckpt = tmp_path / "raft-sintel.pth"
    torch.save(torch.nn.DataParallel(tm).state_dict(), ckpt)

    loaded = _load_twice("RAFT", ckpt, tmp_path, monkeypatch)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    _tree_equal(loaded.params, C.raft_params_from_state(sd))

    # full chain on an ODD size through the padder: file → load_model →
    # make_flow_fn → unpadded flow == torch forward (same file's weights)
    H, W = 126, 130  # pads to 128×136 at divisor 8
    loaded = runtime.load_model("RAFT", checkpoint=str(ckpt), iters=3)
    padder, flow_fn = runtime.make_flow_fn(loaded, (H, W))
    rng = np.random.default_rng(0)
    i1 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    i2 = (rng.random((1, 3, H, W)) * 255).astype(np.float32)
    with torch.no_grad():
        _, ref = tm(
            torch.nn.functional.pad(
                torch.from_numpy(i1), (3, 3, 1, 1), mode="replicate"),
            torch.nn.functional.pad(
                torch.from_numpy(i2), (3, 3, 1, 1), mode="replicate"),
            iters=3, test_mode=True,
        )
    ref = ref.numpy()[:, :, 1:-1, 3:-3]
    x1p, x2p = padder.pad(
        jnp.asarray(i1.transpose(0, 2, 3, 1) / 255.0),
        jnp.asarray(i2.transpose(0, 2, 3, 1) / 255.0),
    )
    out = flow_fn(x1p, x2p)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref,
        rtol=1e-3, atol=1e-3,
    )


def test_gma_dataparallel_pth_roundtrip(tmp_path, monkeypatch):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.gma.network import RAFTGMA

    torch.manual_seed(0)
    tm = RAFTGMA(Namespace(num_heads=1, mixed_precision=False,
                           position_only=False, position_and_content=False,
                           dropout=0))
    tm.eval()
    ckpt = tmp_path / "gma-sintel.pth"
    torch.save(torch.nn.DataParallel(tm).state_dict(), ckpt)

    loaded = _load_twice("GMA", ckpt, tmp_path, monkeypatch)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches_tracked" not in k}
    _tree_equal(loaded.params, C.gma_params_from_state(sd))


def test_pwcnet_statedict_wrapper_roundtrip(tmp_path, monkeypatch):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # Install the WORKING correlation stub shared with test_pwcnet.py —
    # never a raising one: the reference module binds the symbol at import
    # and sys.modules entries outlive this test, so a raising stub here
    # broke test_pwcnet_matches_reference when the full suite ran in one
    # process (round-3 suite failure).
    from tests.test_pwcnet import _stub_scs

    sys.modules.setdefault("spatial_correlation_sampler", _stub_scs())
    from models.PWCNet.PWCNet import PWCDCNet

    torch.manual_seed(0)
    tm = PWCDCNet()
    tm.eval()
    # the shipped pwc_net_chairs.pth.tar carries a {'state_dict': …} wrapper
    ckpt = tmp_path / "pwc_net_chairs.pth.tar"
    torch.save({"state_dict": tm.state_dict()}, ckpt)

    loaded = _load_twice("PWCNet", ckpt, tmp_path, monkeypatch)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    _tree_equal(loaded.params, C.pwcnet_params_from_state(sd))


def test_spynet_per_layer_files_roundtrip(tmp_path, monkeypatch):
    """Per-layer raw-tensor files in the reference's exact naming
    (`SpyNet.py:77-81`): `modelL{level}_F-{conv}-{weight,bias}.pth.tar`."""
    rng = np.random.default_rng(1)
    chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    wdir = tmp_path / "spynet_weights"
    wdir.mkdir()
    levels = []
    for lvl in range(6):
        convs = []
        for j, (cin, cout) in enumerate(chans):
            w = (rng.standard_normal((cout, cin, 7, 7)) * 0.1).astype(np.float32)
            b = (rng.standard_normal((cout,)) * 0.1).astype(np.float32)
            torch.save(torch.from_numpy(w),
                       wdir / f"modelL{lvl + 1}_F-{j + 1}-weight.pth.tar")
            torch.save(torch.from_numpy(b),
                       wdir / f"modelL{lvl + 1}_F-{j + 1}-bias.pth.tar")
            convs.append((w, b))
        levels.append(convs)

    loaded = _load_twice("SpyNet", wdir, tmp_path, monkeypatch)
    _tree_equal(loaded.params, C.spynet_params_from_arrays(levels))


@pytest.mark.slow
def test_flownet2_checkpoint_tar_roundtrip(tmp_path, monkeypatch):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # reuse the CUDA-package stubs installed by the FlowNet2 oracle tests
    from tests.test_flownet2 import _install_stubs

    _install_stubs()
    from models.FlowNet.FlowNet2 import FlowNet2 as TorchFN2

    torch.manual_seed(0)
    tm = TorchFN2(Namespace(fp16=False, rgb_max=255.0), batchNorm=False)
    tm.eval()
    # the shipped FlowNet2_checkpoint.pth.tar: {'state_dict': …} + metadata
    ckpt = tmp_path / "FlowNet2_checkpoint.pth.tar"
    torch.save({"epoch": 0, "best_EPE": 2.02, "state_dict": tm.state_dict()},
               ckpt)

    loaded = _load_twice("FlowNet2", ckpt, tmp_path, monkeypatch)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    _tree_equal(loaded.params, C.flownet2_params_from_state(sd))
