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
