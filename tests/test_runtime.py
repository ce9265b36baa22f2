"""Runtime loader: spec wiring, padding composition, error paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcfa_tpu.runtime import WEIGHT_PATHS, load_model, make_flow_fn


def test_missing_checkpoint_raises():
    with pytest.raises(FileNotFoundError) as e:
        load_model("RAFT")
    assert "load_all_weights.sh" in str(e.value)


def test_random_init_and_flow_fn_unpads():
    loaded = load_model("SpyNet", init_random=True, nlevels=3)
    # odd Sintel-like size → padded, flow comes back at original size
    H, W = 13, 21
    padder, flow_fn = make_flow_fn(loaded, (H, W))
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    [p1], [p2] = padder.pad(x1), padder.pad(x2)
    assert p1.shape[1] % loaded.spec.pad_divisor == 0
    flow = flow_fn(p1, p2)
    assert flow.shape == (1, H, W, 2)


def test_tuple_output_collapsed():
    loaded = load_model("RAFT", init_random=True, iters=1)
    padder, flow_fn = make_flow_fn(loaded, (128, 128))
    x = jnp.zeros((1, 128, 128, 3))
    flow = flow_fn(x, x)  # RAFT returns (lr, up); flow_fn yields up, unpadded
    assert flow.shape == (1, 128, 128, 2)


def test_all_registered_models_have_weight_paths():
    from pcfa_tpu.models import available_models

    for name in available_models():
        if name == "RAFT-small":  # no shipped checkpoint in the reference
            continue
        assert name in WEIGHT_PATHS


def test_converted_param_cache(tmp_path, monkeypatch, rng):
    """Conversion result is cached as msgpack and reloaded torch-free."""
    import torch

    import pcfa_tpu.runtime as rt

    # build a fake SpyNet weight dir (per-layer files, `SpyNet.py:77-81`)
    wdir = tmp_path / "spynet_weights"
    wdir.mkdir()
    chans = [(8, 32), (32, 64), (64, 32), (32, 16), (16, 2)]
    for lvl in range(1, 7):
        for j, (cin, cout) in enumerate(chans, 1):
            torch.save(torch.randn(cout, cin, 7, 7),
                       wdir / f"modelL{lvl}_F-{j}-weight.pth.tar")
            torch.save(torch.randn(cout), wdir / f"modelL{lvl}_F-{j}-bias.pth.tar")

    monkeypatch.setattr(rt, "_cache_path",
                        lambda name: str(tmp_path / f"{name}.msgpack"))
    l1 = rt.load_model("SpyNet", checkpoint=str(wdir))
    assert (tmp_path / "SpyNet.msgpack").exists()

    # second load comes from the cache and matches exactly
    import dataclasses

    from pcfa_tpu.models import spec as spec_mod

    def no_convert(path):
        raise AssertionError("converter should not run on cache hit")

    monkeypatch.setitem(
        spec_mod._REGISTRY, "SpyNet",
        dataclasses.replace(l1.spec, convert=no_convert),
    )
    l2 = rt.load_model("SpyNet", checkpoint=str(wdir))
    a = jax.tree.leaves(l1.params)
    b = jax.tree.leaves(l2.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pwcnet_bf16_lbfgs_history_fenced(monkeypatch):
    """PCFA_LBFGS_DTYPE=bfloat16 destabilizes PWCNet's attack trajectory
    (measured, BASELINE.md round 3) — config.lbfgs_history_dtype(net) must
    refuse the combination instead of silently running a broken attack,
    unless PCFA_LBFGS_DTYPE_FORCE=1 explicitly overrides."""
    from pcfa_tpu import config

    monkeypatch.setenv("PCFA_LBFGS_DTYPE", "bfloat16")
    monkeypatch.delenv("PCFA_LBFGS_DTYPE_FORCE", raising=False)
    # safe nets keep the knob
    assert config.lbfgs_history_dtype("RAFT") == "bfloat16"
    assert config.lbfgs_history_dtype() == "bfloat16"
    with pytest.raises(ValueError, match="PWCNet"):
        config.lbfgs_history_dtype("PWCNet")
    # explicit override warns but proceeds
    monkeypatch.setenv("PCFA_LBFGS_DTYPE_FORCE", "1")
    with pytest.warns(UserWarning, match="measured-unsafe"):
        assert config.lbfgs_history_dtype("PWCNet") == "bfloat16"
    # fp32 history is always fine
    monkeypatch.setenv("PCFA_LBFGS_DTYPE", "float32")
    monkeypatch.delenv("PCFA_LBFGS_DTYPE_FORCE", raising=False)
    assert config.lbfgs_history_dtype("PWCNet") is None
