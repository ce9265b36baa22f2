#!/usr/bin/env python3
"""Train + package universal perturbations in the reference's shipped layout.

The reference ships its best trained universal perturbations as
`universal_perturbations/{Net}_{Dataset}.npy` for black-box reproduction
(`/root/reference/readme.md:157-169`; the blobs themselves are stripped from
this mount — `.MISSING_LARGE_BLOBS`). This script reproduces that artifact
set with the TPU rebuild: it runs `attack_PCFA.py --universal_perturbation
--joint_perturbation` per (net, dataset), then copies the final-epoch delta
out of the run's `patches/` folder into `universal_perturbations/` under the
reference's naming, ready for `evaluate_PCFA.py --perturbation_sourcefolder=
universal_perturbations/{Net}_{Dataset}.npy --joint_perturbation
--universal_perturbation`.

Usage:
  python scripts/make_universal_perturbations.py \
      [--nets SpyNet,PWCNet,RAFT,GMA,FlowNet2] [--datasets Kitti15,Sintel] \
      [--epochs 5] [--steps 1] [--out universal_perturbations] [--smoke]

`--smoke` substitutes the Synthetic dataset + random-init weights so the
pipeline can be exercised without pretrained weights or dataset mounts
(neither is available on this machine); the artifact layout is identical.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_final_delta(run_root: str) -> str:
    """Find the highest-epoch 00000_delta1_e{N}.npy under any patches/ dir."""
    cands = glob.glob(os.path.join(run_root, "**", "patches",
                                   "*delta1_e*.npy"), recursive=True)
    if not cands:
        raise FileNotFoundError(
            f"no universal delta artifacts under {run_root}")

    def epoch(p: str) -> int:
        m = re.search(r"delta1_e(\d+)\.npy$", p)
        return int(m.group(1)) if m else -1

    return max(cands, key=epoch)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nets", default="SpyNet,PWCNet,RAFT,GMA,FlowNet2")
    ap.add_argument("--datasets", default="Kitti15,Sintel")
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--steps", type=int, default=1,
                    help="LBFGS steps per batch (readme.md:115 suggests 1 "
                         "for universal training)")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "universal_perturbations"))
    ap.add_argument("--smoke", action="store_true",
                    help="Synthetic data + random weights (no downloads)")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    failures = []
    for net in args.nets.split(","):
        for dataset in args.datasets.split(","):
            with tempfile.TemporaryDirectory() as tmp:
                cmd = [
                    sys.executable, os.path.join(REPO, "attack_PCFA.py"),
                    f"--net={net}", "--universal_perturbation",
                    "--joint_perturbation", "--boxconstraint=clipping",
                    f"--steps={args.steps}", f"--epochs={args.epochs}",
                    "--dataset_stage=training",
                    f"--output_folder={tmp}", "--unregistered_artifacts",
                ]
                env = dict(os.environ)
                if args.smoke:
                    cmd += ["--dataset=Synthetic", "--epochs=1", "--steps=1",
                            "--batch_size=2"]
                    env.setdefault("PCFA_SYNTHETIC_COUNT", "2")
                    env.setdefault("PCFA_SYNTHETIC_SIZE", "64x64")
                else:
                    cmd += [f"--dataset={dataset}"]
                    if dataset == "Sintel":
                        cmd += ["--dstype=final"]  # readme.md:169
                print("+", " ".join(cmd), flush=True)
                rc = subprocess.call(cmd, env=env)
                if rc != 0:
                    failures.append((net, dataset, rc))
                    continue
                dst = os.path.join(args.out, f"{net}_{dataset}.npy")
                shutil.copyfile(newest_final_delta(tmp), dst)
                print(f"wrote {dst}", flush=True)

    if failures:
        print(f"FAILED: {failures}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
