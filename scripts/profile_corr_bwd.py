#!/usr/bin/env python3
"""Correlation kernels, forward AND forward+backward: XLA vs Pallas.

Times (fenced value-fetch, see profile_attack.fenced) the PWCNet local
correlation at its pyramid-level shapes and the FlowNetC global correlation
at its /8 shape, each as fwd and fwd+bwd-wrt-both-inputs — the quantity the
attack's L-BFGS closure actually pays (VERDICT round-1 weak #1: the Pallas
forward win was never measured end-to-end through the backward).

Usage: python scripts/profile_corr_bwd.py [--size HxW]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_attack import fenced  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="384x1280",
                    help="image size; feature shapes derive from it")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.ops.correlation import global_correlation, local_correlation
    from pcfa_tpu.ops.pallas import (
        global_correlation_pallas,
        local_correlation_pallas,
    )

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind}", file=sys.stderr)
    rng = np.random.default_rng(0)

    def bench_pair(tag, xla_fn, pallas_fn, shape):
        f1 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        f2 = jnp.asarray(rng.standard_normal(shape), jnp.float32)

        for name, fn in (("xla", xla_fn), ("pallas", pallas_fn)):
            fwd = jax.jit(fn)
            t_f = fenced(fwd, f1, f2)

            def loss(a, b, _fn=fn):
                return jnp.sum(_fn(a, b) ** 2)

            fb = jax.jit(jax.grad(loss, argnums=(0, 1)))
            t_fb = fenced(fb, f1, f2)
            print(f"{tag:28s} {name:6s} {shape}  "
                  f"fwd {t_f * 1e3:8.1f} ms   fwd+bwd {t_fb * 1e3:8.1f} ms")

    # PWCNet local corr levels (feature C per level, /4 … /64)
    for lvl, (div, C) in enumerate(
        ((4, 32), (8, 64), (16, 96), (32, 128), (64, 196)), start=2
    ):
        shape = (1, H // div, W // div, C)
        bench_pair(
            f"local patch9 lvl{lvl} (/{div})",
            lambda a, b: local_correlation(a, b, 9),
            lambda a, b: local_correlation_pallas(a, b, 9),
            shape,
        )

    # FlowNetC global corr at /8
    shape = (1, H // 8, W // 8, 256)
    bench_pair(
        "global 441ch (/8)",
        lambda a, b: global_correlation(a, b, 20, 2),
        lambda a, b: global_correlation_pallas(a, b, 20, 2),
        shape,
    )


if __name__ == "__main__":
    main()
