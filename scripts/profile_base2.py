#!/usr/bin/env python3
"""Cumulative ablation of the RAFT closure BASE cost (slope-timed).

profile_base.py established base ≈ 117 ms + ~7.8 ms/refinement-iteration
(fwd+bwd, batch=2, bf16, v5e) but not where inside the base the time goes.
This script slope-times grad closures that stop at successive depths of the
forward graph, so each increment attributes one stage *including its
backward* under the exact bench stack:

  E        grad of loss on encoder outputs only (fnet both frames + cnet)
  E+V      ... + all-pairs volume + 4-level pyramid
  E+V+I1   full RAFT iters=1, loss on flow_lr   (adds lookup+GRU+flow head)
  E+V+I1+U full RAFT iters=1, loss on flow_up   (adds convex upsampling)
  full-12  full RAFT iters=12, loss on flow_up  (adds 11 more iterations)

All stages share input shapes with the bench (padded KITTI, batch 2) and the
bf16 compute stack. Differences between consecutive rows are the honest
fwd+bwd cost of the added stage; the chain is driven from host with one
scalar fetch at the end (slope timing — immune to the axon tunnel's
per-dispatch/fetch overhead, see CLAUDE.md).

Usage: python scripts/profile_base2.py [--size HxW] [--batch B] [--remat auto]
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
    ap.add_argument("--remat", choices=["on", "off"], default="on")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models import make_model
    from pcfa_tpu.models.layers import BasicEncoder
    from pcfa_tpu.ops.correlation import allpairs_correlation, corr_pyramid

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    remat = args.remat == "on"
    print(f"device: {dev.platform}:{dev.device_kind} batch={B} "
          f"size={H}x{W} remat={args.remat}", file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    def cast(tree):
        return jax.tree.map(lambda t: t.astype(cdtype), tree)

    a0 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    b0 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

    fnet = BasicEncoder(output_dim=256, norm_fn="instance")
    cnet = BasicEncoder(output_dim=256, norm_fn="batch")
    fp = cast(fnet.init(jax.random.PRNGKey(0), a0[:1])["params"])
    cp = cast(cnet.init(jax.random.PRNGKey(1), a0[:1])["params"])

    def encoders(a, b):
        x2 = jnp.concatenate([a, b], 0).astype(cdtype)
        f12 = fnet.apply({"params": fp}, x2)
        ctx = cnet.apply({"params": cp}, a.astype(cdtype))
        return f12[:B], f12[B:], ctx

    def timed(name, loss):
        g = jax.jit(jax.grad(loss, argnums=(0, 1)))

        def gstep(ab):
            da, db = g(*ab)
            return (ab[0] + 1e-6 * da, ab[1] + 1e-6 * db)

        ms = slope_ms(gstep, (a0, b0), n_lo, n_hi)
        print(f"{name:44s} {ms:8.1f} ms/call")
        return ms

    def sq(t):
        return jnp.sum(t.astype(jnp.float32) ** 2) * 1e-6

    timed("E      encoders only (fnet x2 + cnet)",
          lambda a, b: sum(sq(t) for t in encoders(a, b)))

    def with_volume(a, b):
        f1, f2, ctx = encoders(a, b)
        pyr = corr_pyramid(allpairs_correlation(f1, f2))
        return sum(sq(l) for l in pyr) + sq(ctx)

    timed("E+V    + allpairs volume + pyramid", with_volume)

    for iters, loss_on, name in (
        (1, 0, "E+V+I1 full RAFT iters=1, loss on flow_lr"),
        (1, 1, "E+V+I1+U ... iters=1, loss on flow_up"),
        (12, 1, "full   RAFT iters=12, loss on flow_up"),
    ):
        model, _ = make_model("RAFT", iters=iters, remat=remat)
        params = cast(model.init(jax.random.PRNGKey(0), a0[:1], b0[:1])
                      ["params"])

        def loss(a, b, model=model, params=params, idx=loss_on):
            out = model.apply({"params": params},
                              a.astype(cdtype), b.astype(cdtype))[idx]
            return sq(out)

        timed(name, loss)

    print("done")


if __name__ == "__main__":
    main()
