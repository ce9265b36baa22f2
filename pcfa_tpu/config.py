"""Static configuration: dataset paths and feature flags.

TPU-native replacement for the reference's class-attribute config
(`helper_functions/config_paths.py:1-35`). Paths resolve from environment
variables first, then an optional JSON file `pcfa_paths.json` in the working
directory, then the built-in defaults — so CI and multi-host launches can
configure data roots without editing source.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path


_PATHS_FILE = "pcfa_paths.json"

# Dataset split names, mirroring config_paths.py:8-14.
SPLITS = {
    "sintel_train": "training",
    "sintel_eval": "test",
    "kitti_train": "training",
    "kitti_eval": "testing",
}


@dataclasses.dataclass(frozen=True)
class PathsConfig:
    """Dataset roots. Empty string means 'not configured'."""

    sintel_mpi: str = ""
    kitti15: str = ""

    @staticmethod
    def load(cwd: str | None = None) -> "PathsConfig":
        cfg = {}
        path = Path(cwd or os.getcwd()) / _PATHS_FILE
        if path.is_file():
            try:
                cfg = json.loads(path.read_text())
            except (OSError, json.JSONDecodeError):
                cfg = {}
        return PathsConfig(
            sintel_mpi=os.environ.get("PCFA_SINTEL_ROOT", cfg.get("sintel_mpi", "")),
            kitti15=os.environ.get("PCFA_KITTI15_ROOT", cfg.get("kitti15", "")),
        )


def splits(name: str) -> str:
    return SPLITS[name]


def paths(name: str) -> str:
    return getattr(PathsConfig.load(), name)


def lbfgs_direction() -> str:
    """L-BFGS direction algorithm: 'compact' (Byrd–Nocedal–Schnabel matmul
    form — algebraically identical to torch's two-loop recursion, 2.1×
    cheaper per full-history iteration on v5e, passes the torch trajectory
    parity tests) or 'two_loop' (bit-level torch rounding behavior). The
    CLIs and bench default to 'compact'; PCFA_LBFGS_DIRECTION overrides."""
    return os.environ.get("PCFA_LBFGS_DIRECTION", "compact")


def lbfgs_history_dtype(net: str | None = None) -> str | None:
    """Curvature-pair storage dtype for L-BFGS ('bfloat16' halves the
    optimizer's HBM footprint — 2.25 → 1.12 GB per KITTI pair — at a ~0.4%
    rounding of the y/s pairs). Default fp32; env knob PCFA_LBFGS_DTYPE.

    Pass the network name to enforce measured-safe combinations: bf16
    curvature history DESTABILIZES PWCNet (measured on v5e: the attack
    trajectory diverges, loss 0.25 → 7.96e4, best-under-bound ‖δ‖ 65% off
    — BASELINE.md round 3), so PWCNet + bfloat16 refuses loudly, in the
    spirit of the reference's unsupported-combo ValueErrors
    (`attack_PCFA.py:91-92`). PCFA_LBFGS_DTYPE_FORCE=1 overrides (for
    re-measuring), with a warning."""
    v = os.environ.get("PCFA_LBFGS_DTYPE", "")
    v = v if v and v != "float32" else None
    if v == "bfloat16" and net == "PWCNet":
        if os.environ.get("PCFA_LBFGS_DTYPE_FORCE") == "1":
            import warnings

            warnings.warn(
                "PCFA_LBFGS_DTYPE=bfloat16 with PWCNet is measured-unsafe "
                "(trajectory destabilizes, BASELINE.md round 3); forcing "
                "because PCFA_LBFGS_DTYPE_FORCE=1", stacklevel=2)
            return v
        raise ValueError(
            "PCFA_LBFGS_DTYPE=bfloat16 is unsupported for PWCNet: bf16 "
            "curvature history destabilizes its attack trajectory (loss "
            "0.25 → 7.96e4, l2_min 65% off — measured on v5e, BASELINE.md "
            "round 3). Unset PCFA_LBFGS_DTYPE or set "
            "PCFA_LBFGS_DTYPE_FORCE=1 to override for experiments.")
    return v


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    """Device / precision configuration (replaces `Conf` in config_paths.py:24-35).

    On TPU everything runs through XLA; there is no CPU/CUDA switch. The one
    meaningful knob is matmul precision: attacks iterate 200+ network passes,
    so the bf16 default would accumulate error beyond the 1%-AEE parity budget.
    """

    matmul_precision: str = "highest"  # 'default' | 'high' | 'highest'
    debug_nans: bool = False

    def apply(self) -> None:
        import jax

        # PCFA_MATMUL_PRECISION overrides (perf experiments; 'default' is
        # bf16-based and trades the 1%-AEE parity budget for speed)
        precision = os.environ.get("PCFA_MATMUL_PRECISION",
                                   self.matmul_precision)
        jax.config.update("jax_default_matmul_precision", precision)
        if self.debug_nans:
            jax.config.update("jax_debug_nans", True)

        # persistent compilation cache: the attack programs are identical
        # across CLI/bench/profiler invocations but cost minutes per compile
        # on remote TPU compilers. Keyed by HLO hash, so correctness-neutral;
        # backends that can't serialize executables simply skip it.
        # PCFA_COMPILE_CACHE=0 disables; any other value overrides the dir.
        # CPU runs skip it by default: XLA:CPU AOT reload is brittle across
        # machine-feature fingerprints (loader warns about possible SIGILL).
        cache_dir = os.environ.get("PCFA_COMPILE_CACHE", "")
        on_cpu = (os.environ.get("PCFA_CPU")
                  or getattr(jax.config, "jax_platforms", None) == "cpu")
        if cache_dir != "0" and not (on_cpu and not cache_dir):
            if not cache_dir:
                cache_dir = str(Path(__file__).resolve().parent.parent
                                / ".jax_cache")
            try:
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update("jax_persistent_cache_min_compile_time_secs",
                                  2.0)
            except Exception:  # noqa: BLE001 — older jax without the knobs
                pass
