"""Shared CLI runner plumbing: model/data setup, target building, metrics."""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from pcfa_tpu.attack.losses import avg_epe
from pcfa_tpu.attack.targets import fit_custom_target, load_custom_target
from pcfa_tpu.config import RuntimeConfig
from pcfa_tpu.data import prepare_dataloader
from pcfa_tpu.runtime import LoadedModel, load_model, make_flow_fn


def setup_runtime():
    # join the multi-process cluster BEFORE anything initializes the XLA
    # backend (a no-op unless a coordinator is configured — see
    # `parallel/multihost.py`)
    from pcfa_tpu.parallel.multihost import initialize

    initialize()
    RuntimeConfig().apply()


def load_attack_model(args) -> LoadedModel:
    """Load the net under attack; fall back to deterministic random params
    with a loud warning when no converted checkpoint is available (the
    reference exits instead, `ownutilities.py:164-166`)."""
    try:
        return load_model(args.net, checkpoint=getattr(args, "checkpoint", None))
    except FileNotFoundError as e:
        print(f"WARNING: {e}", file=sys.stderr)
        print(
            "WARNING: proceeding with RANDOM-INIT weights — attack metrics "
            "will not correspond to the pretrained network.",
            file=sys.stderr,
        )
        return load_model(
            args.net, checkpoint=getattr(args, "checkpoint", None),
            init_random=True,
        )


def make_loader(args, batch_size=1, shuffle=False):
    return prepare_dataloader(
        mode=args.dataset_stage,
        dataset=args.dataset,
        shuffle=shuffle,
        batch_size=batch_size,
        small_run=args.small_run,
        dstype=args.dstype,
        # restrict each host to its dataset slice under multi-host
        # execution (a no-op in single-process runs)
        process_shard=True,
    )


def pad_mode_for(dataset: str) -> str:
    # reference uses the sintel (centered) padding for every dataset
    # (`ownutilities.py:26-33` default mode='sintel')
    return "sintel"


def build_target(args, flow_pred_init: jnp.ndarray) -> jnp.ndarray:
    """`targets.get_target` (`targets.py:89-115`) — zero / neg_flow /
    custom (file loaded once, fitted to prediction size, batch-repeated)."""
    if args.target == "zero":
        return jnp.zeros_like(flow_pred_init)
    if args.target == "neg_flow":
        return -flow_pred_init
    if args.target == "custom":
        tgt = load_custom_target(args.custom_target_path)
        B, H, W, _ = flow_pred_init.shape
        fitted = fit_custom_target(tgt, H, W)
        return jnp.broadcast_to(jnp.asarray(fitted)[None], (B, H, W, 2))
    raise ValueError(f"unknown target {args.target}")


def epe(a, b) -> float:
    return float(avg_epe(jnp.asarray(a), jnp.asarray(b)))


def unit_images(img1: np.ndarray, img2: np.ndarray):
    """Dataset batches arrive in [0,255] (`datasets.py:79-88`); the whole
    attack pipeline operates in unit scale."""
    return (
        jnp.asarray(img1, jnp.float32) / 255.0,
        jnp.asarray(img2, jnp.float32) / 255.0,
    )


def should_save(batch: int, args) -> bool:
    """Artifact cadence (`attack_PCFA.py:251`)."""
    if args.no_save:
        return False
    if args.small_save:
        return batch < 32
    return batch % args.save_frequency == 0
