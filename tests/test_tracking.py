"""Tracking/artifact layer: naming, layouts, metric sink round-trips."""

import json
import os

import numpy as np

from pcfa_tpu.cli.evaluate_pcfa import load_delta_nhwc
from pcfa_tpu.utils.tracking import (
    Tracker,
    max_flow_length,
    save_flow,
    save_image,
    save_tensor,
)


def test_experiment_naming(tmp_path):
    t = Tracker(str(tmp_path), "RAFT", "PCFA", joint_perturbation=True,
                universal_perturbation=True, use_mlflow=False)
    assert t.experiment_name == "RAFT_PCFA_cd_u"
    t2 = Tracker(str(tmp_path), "GMA", "PCFA", False, False, stage="eval",
                 use_mlflow=False)
    assert t2.experiment_name == "GMA_PCFA_dd_-_eval"
    assert t2.folder_name.endswith("_GMA_PCFA_dd_-_eval")


def test_metrics_jsonl_and_params(tmp_path):
    with Tracker(str(tmp_path), "SpyNet", "FGSM", False, False,
                 use_mlflow=False) as t:
        t.log_param("alpha", 3)
        t.log_metrics(7, ("aee_pred-tgt", 1.5), ("skipme", None))
        avgs = t.log_averages(2, ("aee_avg_pred-tgt", 3.0), ("none", None))
    assert avgs == {"aee_avg_pred-tgt": 1.5}
    lines = [json.loads(l) for l in
             open(os.path.join(t.folder_path, "metrics.jsonl"))]
    assert {"key": "aee_pred-tgt", "value": 1.5, "step": 7} in lines
    params = json.load(open(os.path.join(t.folder_path, "params.json")))
    assert params["alpha"] == 3


def test_save_tensor_nchw_roundtrip(tmp_path, rng):
    """Artifacts are reference-layout NCHW; the evaluator loads them back."""
    arr = rng.random((1, 6, 8, 3)).astype(np.float32)  # NHWC in-framework
    p = save_tensor(arr, "delta1_final", 3, str(tmp_path))
    assert p.endswith("00003_delta1_final.npy")
    stored = np.load(p)
    assert stored.shape == (1, 3, 6, 8)  # NCHW on disk
    back = load_delta_nhwc(p)
    np.testing.assert_array_equal(back, arr[0])


def test_save_image_normalization(tmp_path, rng):
    from PIL import Image

    delta = (rng.random((4, 4, 3)).astype(np.float32) - 0.5) * 0.1
    p = save_image(delta, 0, str(tmp_path), image_name="d",
                   normalize_max=0.05)
    img = np.asarray(Image.open(p))
    assert img.shape == (4, 4, 3) and img.dtype == np.uint8
    # normalize_max maps [-max, max] → [0, 255] around 127
    assert 0 <= img.min() and img.max() <= 255


def test_save_flow_png(tmp_path, rng):
    flow = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
    p = save_flow(flow, 1, str(tmp_path), flow_name="f", auto_scale=True)
    assert p.endswith("00001_f.png") and os.path.getsize(p) > 0


def test_max_flow_length_corrected():
    f = np.zeros((2, 2, 2))
    f[0, 0] = (3.0, 4.0)
    assert max_flow_length(f, None) == 5.0  # sqrt(3²+4²), not the ref's bug


def test_mlflow_branch_with_stub(tmp_path, monkeypatch):
    """Exercise the live-MLflow branch (experiment creation, run lifecycle,
    param/metric/artifact forwarding — `logging.py:88-111,343-354` analog)
    against a stub mlflow module, since the real package is absent here."""
    import types

    import pcfa_tpu.utils.tracking as tr

    calls = []

    class _Exp:
        experiment_id = "exp7"

    stub = types.SimpleNamespace(
        create_experiment=lambda name: calls.append(("create", name)),
        get_experiment_by_name=lambda name: _Exp(),
        start_run=lambda experiment_id, run_name: (
            calls.append(("start", experiment_id, run_name)) or
            types.SimpleNamespace(info=types.SimpleNamespace(run_id="r1"))
        ),
        end_run=lambda: calls.append(("end",)),
        log_param=lambda key, value: calls.append(("param", key, value)),
        log_metric=lambda key, value, step: calls.append(
            ("metric", key, value, step)),
        log_artifact=lambda fp: calls.append(("artifact", fp)),
    )
    monkeypatch.setattr(tr, "mlflow", stub)

    with Tracker(str(tmp_path), "RAFT", "PCFA", False, False) as t:
        assert t._use_mlflow
        t.log_param("delta_bound", 0.005)
        t.log_metric("aee_pred-tgt", 1.5, step=3)
        art = tmp_path / "x.npy"
        np.save(art, np.zeros(2))
        t.register_artifact(str(art))

    kinds = [c[0] for c in calls]
    assert kinds == ["create", "start", "param", "metric", "artifact", "end"]
    assert ("param", "delta_bound", 0.005) in calls
    assert ("metric", "aee_pred-tgt", 1.5, 3) in calls
    # the JSONL sink keeps writing alongside MLflow
    run_dir = t.folder_path
    assert os.path.exists(os.path.join(run_dir, "metrics.jsonl"))
    assert os.path.exists(os.path.join(run_dir, "params.json"))


def test_mlflow_branch_existing_experiment(tmp_path, monkeypatch):
    """The `create_experiment` already-exists path (`tracking.py:86-88`,
    mirroring `helper_functions/logging.py:187-191`): a raising
    create_experiment must not abort the run — the tracker falls through to
    `get_experiment_by_name` and starts the run in the existing experiment."""
    import types

    import pcfa_tpu.utils.tracking as tr
    from pcfa_tpu.utils.tracking import Tracker

    calls = []

    def _raise(name):
        calls.append(("create", name))
        raise RuntimeError("experiment already exists")

    stub = types.SimpleNamespace(
        create_experiment=_raise,
        get_experiment_by_name=lambda name: types.SimpleNamespace(
            experiment_id="exp7"),
        start_run=lambda experiment_id, run_name: (
            calls.append(("start", experiment_id, run_name)) or
            types.SimpleNamespace(info=types.SimpleNamespace(run_id="r2"))
        ),
        end_run=lambda: calls.append(("end",)),
        log_param=lambda key, value: None,
        log_metric=lambda key, value, step: None,
        log_artifact=lambda fp: None,
    )
    monkeypatch.setattr(tr, "mlflow", stub)

    with Tracker(str(tmp_path), "GMA", "FGSM", True, True, stage="eval") as t:
        assert t.experiment_name == "GMA_FGSM_cd_u_eval"

    assert [c[0] for c in calls] == ["create", "start", "end"]
    assert calls[1][1] == "exp7"  # run started in the EXISTING experiment
