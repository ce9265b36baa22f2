#!/usr/bin/env python3
"""Sweep the shifted-slab kernel's (TH, G) plan at a given conv shape.

_plan()'s efficiency model scores MXU-tile fit and Toeplitz MAC waste, but
the attack closure is HBM-bound at layer1 shapes: the row-slab pre-gather
duplicates input rows/TH-fold, so larger TH trades (free) redundant MACs
for less DMA. This measures fwd+dx per plan so the model can be re-fit to
reality. Same scan-chained slope method as profile_layer1.py.

Usage: python scripts/profile_pconv_plan.py [--shape B,H,C,W] [--cout N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("PCFA_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")

from profile_chain import slope_ms_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="6,188,64,624")
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--reps", default="2,12")
    ap.add_argument("--plans", default="2,32;4,32;8,32;4,16;8,16;2,16")
    args = ap.parse_args()
    B, H, C, W = (int(v) for v in args.shape.split(","))
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    import pcfa_tpu.ops.pallas.small_conv as m

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} shape={B},{H},{C},{W} "
          f"cout={args.cout}", file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, H, C, W)), cdtype)
    w0 = jnp.asarray(
        rng.standard_normal((3, 3, C, args.cout)) * 0.05, cdtype)
    b0 = jnp.zeros((args.cout,), cdtype)

    orig_plan = m._plan

    def bench_plan(plan):
        if plan is not None:
            m._plan = lambda *a, **k: plan
        else:
            m._plan = orig_plan
        try:
            def step(x):
                def loss(a):
                    y = m.small_conv2d(a, w0, b0, None, 1)
                    return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
                return x + jax.grad(loss)(x).astype(x.dtype)
            return slope_ms_scan(step, x0, n_lo, n_hi)
        finally:
            m._plan = orig_plan

    ms = bench_plan(None)
    print(f"plan auto ({orig_plan(C, args.cout, H, 3)})   {ms:8.2f} ms/call")
    for spec in args.plans.split(";"):
        th, g = (int(v) for v in spec.split(","))
        if H % th:
            print(f"plan ({th},{g})   skipped (H % TH)")
            continue
        ms = bench_plan((th, g))
        print(f"plan ({th},{g})   {ms:8.2f} ms/call")
    print("done")


if __name__ == "__main__":
    main()
