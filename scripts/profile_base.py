#!/usr/bin/env python3
"""Dissect the RAFT closure's BASE cost (everything outside the iterations).

profile_chain.py measured closure(12it)=215 ms / closure(1it)=123 ms but the
stage sum (fnet 29.5 + cnet 18.4 + volume 8.4 + iter ~8) explains only ~65 ms
— ~50 ms of the base is unattributed. Ablations (all slope-timed):

  * forward only, 12it              (no autodiff at all)
  * grad, loss on flow_up (=bench)  12it and 1it
  * grad, loss on flow_lr           (upsample + mask heads DCE-able) 12/1it
  * grad, loss on flow_up, mask head hoisted OFF the scan (upsample uses a
    recomputed mask from the final net) — measures the stacked-ys cost

Usage: python scripts/profile_base.py [--size HxW] [--batch B]
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
    ap.add_argument("--reps", default="2,12")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models import make_model

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} batch={B} "
          f"size={H}x{W} reps={n_lo},{n_hi}", file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    def cast(tree):
        return jax.tree.map(lambda t: t.astype(cdtype), tree)

    a0 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    b0 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

    def build(iters, remat=True):
        model, _ = make_model("RAFT", iters=iters, remat=remat)
        params = cast(model.init(jax.random.PRNGKey(0), a0[:1],
                                 b0[:1])["params"])

        def apply(a, b):
            return model.apply({"params": params},
                               a.astype(cdtype), b.astype(cdtype))

        return apply

    # --- forward only -------------------------------------------------------
    for iters in (12, 1):
        apply = build(iters)
        fwd = jax.jit(lambda a, b, apply=apply: apply(a, b)[1])

        def fstep(ab, fwd=fwd):
            up = fwd(*ab)
            d = 1e-6 * jnp.mean(up).astype(jnp.float32)
            return (ab[0] + d, ab[1] + d)

        ms = slope_ms(fstep, (a0, b0), n_lo, n_hi)
        print(f"forward only              iters={iters:2d}  {ms:8.1f} ms/call")

    # --- grad variants -------------------------------------------------------
    for loss_on in ("flow_up", "flow_lr"):
        for iters in (12, 1):
            apply = build(iters)
            idx = 1 if loss_on == "flow_up" else 0

            def loss(ab, apply=apply, idx=idx):
                out = apply(*ab)[idx]
                return jnp.mean(out.astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss))

            def gstep(ab, g=g):
                da, db = g(ab)
                return (ab[0] + 1e-6 * da, ab[1] + 1e-6 * db)

            ms = slope_ms(gstep, (a0, b0), n_lo, n_hi)
            print(f"grad loss on {loss_on:8s}     iters={iters:2d}  "
                  f"{ms:8.1f} ms/call")

    print("done")


if __name__ == "__main__":
    main()
