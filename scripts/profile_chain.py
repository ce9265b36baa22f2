#!/usr/bin/env python3
"""Slope-based (chained-dispatch) profiling of the RAFT attack closure.

Single fenced calls through the axon tunnel carry a large constant
dispatch+fetch overhead (CLAUDE.md "Axon tunnel measurement caveats"), which
inflated per-stage numbers badly enough to mis-rank levers (e.g. one
refinement iteration "measured" 554 ms while 12 of them + encoders fit in a
205 ms closure). This script measures the MARGINAL cost instead: build a
dependent chain of N calls (each consuming the previous output), fetch ONE
scalar, and fit the slope between two chain lengths — constant overhead
cancels exactly.

Stages (all at the bench stack: bf16 compute, bf16 matmuls, batch=2):
  * full closure (grad wrt both frames), remat on / off / policy=dots
  * closure at iters=1 (per-iteration slope via iters=12 minus iters=1)
  * fnet / cnet fwd+bwd
  * volume+pyramid fwd+bwd
  * L-BFGS compact direction at history 100

Usage: python scripts/profile_chain.py [--size HxW] [--batch B] [--reps A,B]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("PCFA_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def slope_ms(step_fn, x0, n_lo=2, n_hi=12, trials=2):
    """Marginal per-call ms of `step_fn` (x -> like-x) via chain-length slope.

    The chain is driven from host (queued async dispatches — the tunnel
    pipelines them); one scalar fetch at the end forces completion.
    """
    import jax
    import jax.numpy as jnp

    def run(n):
        x = x0
        for _ in range(n):
            x = step_fn(x)
        leaf = jax.tree.leaves(x)[0]
        return float(jnp.sum(leaf.ravel()[:1]))

    run(1)  # compile
    best = []
    for n in (n_lo, n_hi):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            run(n)
            ts.append(time.perf_counter() - t0)
        best.append(min(ts))
    return (best[1] - best[0]) / (n_hi - n_lo) * 1e3


def slope_ms_scan(step_fn, x0, n_lo=2, n_hi=12, trials=2):
    """`slope_ms` with the chain expressed as `lax.scan` over a length-n
    dummy axis: the body is compiled ONCE instead of inlined n times.

    Use this for heavy step functions (whole residual stages, Pallas-kernel
    closures): the unrolled variant's n_hi-deep HLO once wedged the tunnel's
    remote compiler for >1 h (round 3). Scan also blocks cross-step fusion,
    which is what a marginal-cost measurement wants anyway."""
    import functools
    import time

    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=1)
    def run_n(x, n):
        out, _ = jax.lax.scan(lambda c, _: (step_fn(c), 0.0), x,
                              None, length=n)
        return jnp.sum(jax.tree.leaves(out)[0].ravel()[:1])

    float(run_n(x0, n_lo))  # compile both lengths (same body executable)
    float(run_n(x0, n_hi))
    best = []
    for n in (n_lo, n_hi):
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(run_n(x0, n))
            ts.append(time.perf_counter() - t0)
        best.append(min(ts))
    return (best[1] - best[0]) / (n_hi - n_lo) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="376x1248")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--reps", default="2,12")
    ap.add_argument("--stages", default="closures,encoders,volume,lbfgs",
                    help="comma list: closures,encoders,volume,lbfgs")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))
    stages = set(args.stages.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models import make_model
    from pcfa_tpu.models.layers import BasicEncoder
    from pcfa_tpu.ops.correlation import allpairs_correlation, corr_pyramid

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

    if "closures" in stages:
        for tag, over in (("remat on", {"remat": True}),
                          ("remat policy=dots", {"remat": True,
                                                 "remat_policy": "dots"}),
                          ("remat off", {}),
                          ):
            for iters in (args.iters, 1):
                model, _ = make_model("RAFT", iters=iters, **over)
                params = cast(model.init(
                    jax.random.PRNGKey(0), a0[:1], b0[:1])["params"])

                def loss(ab):
                    a, b = ab
                    up = model.apply(
                        {"params": params},
                        a.astype(cdtype), b.astype(cdtype))[1]
                    return jnp.mean(up.astype(jnp.float32) ** 2)

                g = jax.jit(jax.grad(loss))

                def step(ab, g=g):
                    da, db = g(ab)
                    return (ab[0] + 1e-6 * da, ab[1] + 1e-6 * db)

                try:
                    ms = slope_ms(step, (a0, b0), n_lo, n_hi)
                except Exception as e:  # noqa: BLE001 — OOM etc.
                    print(f"closure {tag:18s} iters={iters:2d}  "
                          f"FAILED: {type(e).__name__}")
                    continue
                print(f"closure {tag:18s} iters={iters:2d}  "
                      f"{ms:8.1f} ms/call")

    if "encoders" in stages:
        for tag, norm, nb in (("fnet(2 frames)", "instance", 2 * B),
                              ("cnet", "batch", B)):
            enc = BasicEncoder(output_dim=256, norm_fn=norm)
            x0 = jnp.asarray(rng.random((nb, H, W, 3)) * 2 - 1, jnp.float32)
            eparams = cast(enc.init(jax.random.PRNGKey(0), x0)["params"])

            def eloss(x):
                out = enc.apply({"params": eparams}, x.astype(cdtype))
                return jnp.mean(out.astype(jnp.float32) ** 2)

            eg = jax.jit(jax.grad(eloss))

            def estep(x, eg=eg):
                return x + 1e-6 * eg(x)

            ms = slope_ms(estep, x0, n_lo, n_hi)
            print(f"{tag:26s} fwd+bwd  {ms:8.1f} ms/call")

    if "volume" in stages:
        H8, W8 = H // 8, W // 8
        f0 = jnp.asarray(rng.standard_normal((B, H8, W8, 256)), cdtype)
        f2 = jnp.asarray(rng.standard_normal((B, H8, W8, 256)), cdtype)

        def vloss(f1):
            pyr = corr_pyramid(allpairs_correlation(f1, f2))
            return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in pyr)

        vg = jax.jit(jax.grad(vloss))

        def vstep(f1, vg=vg):
            return f1 + 1e-6 * vg(f1).astype(cdtype)

        ms = slope_ms(vstep, f0, n_lo, n_hi)
        print(f"{'volume+pyramid':26s} fwd+bwd  {ms:8.1f} ms/call")

    if "lbfgs" in stages:
        from pcfa_tpu.attack.lbfgs import _compact_direction

        n = B * 2 * H * W * 3
        m = 100
        yb = jnp.asarray(rng.standard_normal((m, n)), cdtype)
        sb = jnp.asarray(rng.standard_normal((m, n)), cdtype)
        cnt = jnp.asarray(m, jnp.int32)
        hd = jnp.asarray(1.0, jnp.float32)

        # buffers as ARGS, not captures: captured arrays become inline HLO
        # constants (2.25 GB payload — the tunnel rejects >400 MB compiles)
        dirfn = jax.jit(lambda gr, y, s: _compact_direction(gr, y, s, hd,
                                                            cnt))

        def lstep(gr, dirfn=dirfn):
            return gr + 1e-6 * dirfn(gr, yb, sb)

        g0 = jnp.asarray(rng.standard_normal((n,)), jnp.float32)
        ms = slope_ms(lstep, g0, n_lo, n_hi)
        print(f"{'compact direction m=100':26s}          {ms:8.1f} ms/call")

    print("done")


if __name__ == "__main__":
    main()
