#!/usr/bin/env python3
"""Iteration-count sweep of the FULL RAFT closure → intercept/slope split.

profile_base2.py attributed the closure base cost with standalone encoder /
volume graphs; those can fuse differently than the real model (e.g. with the
loss directly on the pyramid, XLA may never materialize the 215 MB level-0
volume in HBM — the scan forces it). This sweep times grad(loss∘model) at
several `iters` for both corr_impl modes, so the least-squares intercept is
the honest one-time cost *of the real model graph* and the slope the honest
per-iteration cost. Usage:

  python scripts/profile_intercept.py [--size 376x1248] [--batch 2]
      [--iters 1,2,4,12] [--impl materialized,fused] [--remat off]
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

from profile_chain import slope_ms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="376x1248")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", default="1,2,4,12")
    ap.add_argument("--impl", default="materialized,fused")
    ap.add_argument("--reps", default="2,12")
    ap.add_argument("--remat", choices=["on", "off"], default="off")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))
    iters_list = [int(v) for v in args.iters.split(",")]

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models import make_model

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} batch={B} "
          f"size={H}x{W} remat={args.remat}", file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    b0 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

    def cast(tree):
        return jax.tree.map(lambda t: t.astype(cdtype), tree)

    for impl in args.impl.split(","):
        xs, ys = [], []
        for iters in iters_list:
            model, _ = make_model("RAFT", iters=iters,
                                  remat=args.remat == "on", corr_impl=impl)
            params = cast(model.init(jax.random.PRNGKey(0), a0[:1], b0[:1])
                          ["params"])

            def loss(a, b, model=model, params=params):
                out = model.apply({"params": params},
                                  a.astype(cdtype), b.astype(cdtype))[1]
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

            g = jax.jit(jax.grad(loss, argnums=(0, 1)))

            def gstep(ab):
                da, db = g(*ab)
                return (ab[0] + 1e-6 * da, ab[1] + 1e-6 * db)

            ms = slope_ms(gstep, (a0, b0), n_lo, n_hi)
            print(f"{impl:13s} iters={iters:3d}  {ms:8.1f} ms/call")
            xs.append(iters)
            ys.append(ms)
        if len(xs) >= 2:
            slope, intercept = np.polyfit(xs, ys, 1)
            print(f"{impl:13s} fit: intercept {intercept:.1f} ms "
                  f"+ {slope:.2f} ms/iteration")
    print("done")


if __name__ == "__main__":
    main()
