"""CLI integration: PCFA → universal → evaluate chain on tiny synthetic data.

Exercises the full reference workflow (`readme.md:96-169`) without datasets
or pretrained weights (random-init fallback is exercised deliberately).
"""

import glob
import json
import os

import numpy as np
import pytest

from pcfa_tpu.cli.attack_fgsm import main as fgsm_main
from pcfa_tpu.cli.attack_pcfa import main as pcfa_main
from pcfa_tpu.cli.evaluate_pcfa import main as eval_main


@pytest.fixture(autouse=True)
def tiny_synth(monkeypatch):
    monkeypatch.setenv("PCFA_SYNTHETIC_COUNT", "2")
    monkeypatch.setenv("PCFA_SYNTHETIC_SIZE", "64x64")


COMMON = [
    "--net=SpyNet", "--dataset=Synthetic", "--dataset_stage=training",
    "--unregistered_artifacts",
]


def test_pcfa_cli_end_to_end(tmp_path):
    out = str(tmp_path / "pcfa")
    pcfa_main(COMMON + [
        "--steps=1", "--boxconstraint=clipping", f"--output_folder={out}",
    ])
    runs = glob.glob(os.path.join(out, "SpyNet_PCFA_dd_-", "*"))
    assert len(runs) == 1
    patches = os.path.join(runs[0], "patches")
    d1 = np.load(os.path.join(patches, "00000_delta1_final.npy"))
    assert d1.shape == (1, 3, 64, 64)  # reference NCHW artifact layout
    assert os.path.exists(os.path.join(runs[0], "metrics.jsonl"))
    with open(os.path.join(runs[0], "params.json")) as f:
        params = json.load(f)
    assert params["optimizer"] == "LBFGS"


def test_universal_then_evaluate(tmp_path):
    out = str(tmp_path / "uni")
    res = pcfa_main(COMMON + [
        "--steps=1", "--epochs=1", "--batch_size=2",
        "--universal_perturbation", f"--output_folder={out}",
    ])
    run_folder = res["folder_path"]
    assert glob.glob(os.path.join(run_folder, "patches", "*_delta1_e0.npy"))

    results = eval_main(COMMON + [
        "--origin_net=SpyNet", "--universal_perturbation",
        "--boxconstraint=clipping", "--batch_size=2",
        f"--perturbation_sourcefolder={run_folder}",
        f"--output_folder={tmp_path / 'eval'}",
    ])
    assert 0 in results and np.isfinite(results[0]["aee_adv_pred"])


def test_fgsm_cli(tmp_path):
    avgs = fgsm_main(COMMON + [
        "--steps=2", f"--output_folder={tmp_path / 'fgsm'}",
    ])
    assert "aee_avg_predadv-tgt" in avgs
    assert np.isfinite(avgs["l2_avg_delta12"])
    # FGSM step bound: after k steps ‖δ‖∞ ≤ k·ε
    assert avgs["l2_avg_delta12"] <= 2 * 0.00025 + 1e-8


def test_eval_rejects_non_universal(tmp_path):
    with pytest.raises(ValueError):
        eval_main(COMMON + [
            "--origin_net=SpyNet",
            "--perturbation_sourcefolder=/nonexistent",
            f"--output_folder={tmp_path}",
        ])


def test_pcfa_custom_target(tmp_path):
    """--target=custom with a .flo file (crop/pad fitting, `targets.py:33-86`)."""
    import jax.numpy as jnp

    from pcfa_tpu.io import write_flo

    tgt = np.zeros((80, 80, 2), np.float32)  # larger than the 64x64 frames
    tgt[..., 0] = 3.0
    path = str(tmp_path / "tgt.flo")
    write_flo(tgt, path)

    out = str(tmp_path / "out")
    pcfa_main(COMMON + [
        "--steps=1", "--boxconstraint=clipping", "--target=custom",
        f"--custom_target_path={path}", f"--output_folder={out}",
        "--no_save",
    ])
    runs = glob.glob(os.path.join(out, "SpyNet_PCFA_dd_-", "*"))
    assert len(runs) == 1


def test_convert_perturbationsizes_both_directions():
    """Hand-computed padding-family conversion (`evaluate_PCFA.py:60-79`):
    a δ trained on a ÷64 net (SpyNet) must be unpadded with the ÷64 padder
    and replicate-re-padded with the ÷8 padder (RAFT) — and vice versa.
    (The reference's ÷255→×255 dance nets out to identity: this repo works
    in unit scale everywhere, so only the re-pad remains.)"""
    from pcfa_tpu.cli.evaluate_pcfa import convert_perturbationsizes

    rng = np.random.default_rng(0)
    H, W = 20, 30  # SpyNet pads to 64×64 (sintel-centred), RAFT to 24×32

    # SpyNet-trained δ lives at 64×64: top/left pads are 22 and 17
    d_spynet = rng.standard_normal((64, 64, 3)).astype(np.float32)
    out = convert_perturbationsizes(d_spynet, (H, W), "SpyNet", "RAFT")
    assert out.shape == (24, 32, 3)
    core = d_spynet[22:22 + H, 17:17 + W]         # ÷64 unpad (centre crop)
    expected = np.pad(core, ((2, 2), (1, 1), (0, 0)), mode="edge")  # ÷8 re-pad
    np.testing.assert_array_equal(np.asarray(out), expected)

    # reverse: RAFT-trained δ at 24×32 → SpyNet's 64×64
    d_raft = rng.standard_normal((24, 32, 3)).astype(np.float32)
    out2 = convert_perturbationsizes(d_raft, (H, W), "RAFT", "SpyNet")
    assert out2.shape == (64, 64, 3)
    core2 = d_raft[2:2 + H, 1:1 + W]
    expected2 = np.pad(core2, ((22, 22), (17, 17), (0, 0)), mode="edge")
    np.testing.assert_array_equal(np.asarray(out2), expected2)

    # same family is a no-op (object identity, reference behavior)
    assert convert_perturbationsizes(d_raft, (H, W), "RAFT", "GMA") is d_raft
    assert convert_perturbationsizes(
        d_spynet, (H, W), "SpyNet", "FlowNet2") is d_spynet


def test_transfer_evaluate_spynet_to_raft(tmp_path, monkeypatch):
    """Cross-family transfer eval (SpyNet-trained universal δ replayed on
    RAFT) runs the convert_perturbationsizes re-pad branch end-to-end —
    the reference workflow `evaluate_PCFA.py --origin_net` (readme.md
    robustness tables are exactly such cross-net evaluations)."""
    monkeypatch.setenv("PCFA_SYNTHETIC_SIZE", "100x132")
    out = str(tmp_path / "uni")
    res = pcfa_main(COMMON + [
        "--steps=1", "--epochs=1", "--batch_size=2",
        "--universal_perturbation", f"--output_folder={out}",
    ])
    run_folder = res["folder_path"]
    d1 = np.load(glob.glob(
        os.path.join(run_folder, "patches", "*_delta1_e0.npy"))[0])
    assert d1.shape[-2:] == (128, 192)  # SpyNet ÷64 padded shape

    results = eval_main([
        "--net=RAFT", "--dataset=Synthetic", "--dataset_stage=training",
        "--unregistered_artifacts",
        "--origin_net=SpyNet", "--universal_perturbation",
        "--boxconstraint=clipping", "--batch_size=2",
        f"--perturbation_sourcefolder={run_folder}",
        f"--output_folder={tmp_path / 'eval'}",
    ])
    assert 0 in results and np.isfinite(results[0]["aee_adv_pred"])
