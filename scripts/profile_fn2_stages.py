#!/usr/bin/env python3
"""Slope-based per-subnet attribution of the FlowNet2 attack closure.

The fenced profiler (`profile_flownet2.py`) measures dispatch RPC through
the axon tunnel, not kernel time (CLAUDE.md caveats); this script uses the
chain-slope methodology from `profile_chain.py` instead: marginal fwd+bwd
cost of each cascade member (FlowNetC, FlowNetS x2, FlowNetSD, Fusion — at
their in-cascade input shapes, `models/flownet2.py:326-378`) plus the
full-resolution resample2d warp, at the bench stack (bf16 compute, 384x1280).

The members' marginal costs + 4 warps + glue should roughly sum to the
end-to-end closure (~195 ms at the round-4 bench's 0.0234 pairs/s), so the
residual attributes the dispatch/glue overhead.

Usage: python scripts/profile_fn2_stages.py [--size HxW] [--batch B]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_chain import slope_ms, slope_ms_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="384x1280")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", default="2,10")
    ap.add_argument("--stages", default="subnets,warp,corr",
                    help="comma list: subnets,warp,corr,full,lbfgs")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))
    stages = set(args.stages.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models.flownet2 import (
        FlowNetC,
        FlowNetFusion,
        FlowNetS,
        FlowNetSD,
    )
    from pcfa_tpu.ops.warp import resample2d

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} batch={B} "
          f"size={H}x{W} reps={n_lo},{n_hi}", file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    def cast(tree):
        return jax.tree.map(lambda t: t.astype(cdtype), tree)

    if "subnets" in stages:
        # in-cascade input channel counts (`models/flownet2.py:333,343,355,374`)
        for tag, module, c_in in (
            ("FlowNetC", FlowNetC(), 6),
            ("FlowNetS (x2 in cascade)", FlowNetS(), 12),
            ("FlowNetSD", FlowNetSD(), 6),
            ("FlowNetFusion", FlowNetFusion(), 11),
        ):
            x0 = jnp.asarray(rng.random((B, H, W, c_in)) - 0.5, jnp.float32)
            try:
                params = cast(module.init(jax.random.PRNGKey(0), x0[:1])
                              ["params"])

                def loss(x, module=module, params=params):
                    out = module.apply({"params": params}, x.astype(cdtype))
                    return jnp.mean(out.astype(jnp.float32) ** 2)

                g = jax.jit(jax.grad(loss))

                def step(x, g=g):
                    return x + 1e-6 * g(x)

                ms = slope_ms_scan(step, x0, n_lo, n_hi)
            except Exception as e:  # noqa: BLE001 — OOM / compile reject
                print(f"{tag:26s} fwd+bwd  FAILED: {type(e).__name__}: {e}")
                continue
            print(f"{tag:26s} fwd+bwd  {ms:8.1f} ms/call")

    if "warp" in stages:
        img = jnp.asarray(rng.random((B, H, W, 3)), cdtype)

        def wloss(flow):
            out = resample2d(img, flow.astype(cdtype))
            return jnp.mean(out.astype(jnp.float32) ** 2)

        wg = jax.jit(jax.grad(wloss))

        def wstep(flow, wg=wg):
            return flow + 1e-3 * wg(flow)

        f0 = jnp.asarray(rng.standard_normal((B, H, W, 2)) * 4, jnp.float32)
        ms = slope_ms_scan(wstep, f0, n_lo, n_hi)
        print(f"{'resample2d (x4 in cascade)':26s} fwd+bwd  {ms:8.1f} ms/call")

        # in-cascade, each warp ALSO backprops into x2 (dimg = scatter of
        # the cotangent at the gather coords) — measure grads wrt BOTH
        def wloss2(pair):
            flow, im = pair
            out = resample2d(im.astype(cdtype), flow.astype(cdtype))
            return jnp.mean(out.astype(jnp.float32) ** 2)

        wg2 = jax.jit(jax.grad(wloss2))

        def wstep2(pair, wg2=wg2):
            gf, gi = wg2(pair)
            return (pair[0] + 1e-3 * gf, pair[1] + 1e-3 * gi)

        im0 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
        ms = slope_ms_scan(wstep2, (f0, im0), n_lo, n_hi)
        print(f"{'resample2d dflow+dimg':26s} fwd+bwd  {ms:8.1f} ms/call")

    if "full" in stages:
        # whole-cascade closure analog: fwd+bwd wrt BOTH input frames.
        # (full) − (Σ members + 4 warps) = the inter-stage glue
        # (channelnorms, ×4 upsample chains, full-res concats, entry
        # normalization) measured under the same slope methodology.
        from pcfa_tpu.models.flownet2 import FlowNet2

        net = FlowNet2()
        i1 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
        i2 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
        params = cast(net.init(jax.random.PRNGKey(0), i1[:1], i2[:1])
                      ["params"])

        # params as a jit ARG, not a closure constant: 162.5M bf16 params
        # baked into the executable blow the tunnel's ~400 MB compile
        # payload limit (HTTP 413 — CLAUDE.md axon caveats)
        def floss(pair, params):
            a, b = pair
            out = net.apply({"params": params}, a.astype(cdtype),
                            b.astype(cdtype))
            return jnp.mean(out.astype(jnp.float32) ** 2)

        fg = jax.jit(jax.grad(floss, argnums=0))
        params = jax.device_put(params)

        # host-driven chain (slope_ms, not _scan): wrapping the step in a
        # scan would re-capture params as constants of the OUTER jit
        def fstep(pair, fg=fg, params=params):
            g1, g2 = fg(pair, params)
            return (pair[0] + 1e-6 * g1, pair[1] + 1e-6 * g2)

        ms = slope_ms(fstep, (i1, i2), n_lo, n_hi)
        print(f"{'FULL cascade (fwd+bwd)':26s} fwd+bwd  {ms:8.1f} ms/call")

    if "lbfgs" in stages:
        # optimizer-machinery marginal cost at FlowNet2's problem size
        # (n = 2·H·W·3): one lbfgs_iteration around a trivial closure, at
        # the bench stack (m=100 torch default, bf16 curvature history).
        from pcfa_tpu.attack.lbfgs import lbfgs_init, lbfgs_iteration

        n = 2 * H * W * 3
        x0 = jnp.asarray(rng.random((n,)), jnp.float32)

        def vg(x):
            # non-converging closure (|g| stays O(1e-3)) so the break
            # latches never fire mid-scan and every iteration pays the
            # full machinery cost; the closure itself is 2 cheap
            # elementwise passes, so machinery dominates the slope
            v = jnp.sum(1e-3 * jnp.cos(x))
            return v.astype(jnp.float32), -1e-3 * jnp.sin(x)

        for direction, m, hdt in (("compact", 100, jnp.bfloat16),
                                  ("two_loop", 100, jnp.bfloat16),
                                  ("compact", 100, jnp.float32)):
            # steady-state fill: two_loop's fori_loop trip count follows
            # `count` (a fresh state under-measures); compact is
            # fill-independent. ro_buf=0 entries contribute zero — the
            # direction values are garbage but the COST is exact.
            st0 = lbfgs_init(x0, m, hdt)._replace(
                count=jnp.asarray(m, jnp.int32),
                n_iter=jnp.asarray(1, jnp.int32))

            def lstep(st, direction=direction):
                st, _ = lbfgs_iteration(vg, st, jnp.int32(9),
                                        direction=direction)
                return st
            ms = slope_ms_scan(lstep, st0, n_lo, n_hi)
            tag = f"lbfgs m={m} {jnp.dtype(hdt).name[:4]} {direction[:8]}"
            print(f"{tag:26s} machnry  {ms:8.1f} ms/call")

    if "glue" in stages:
        # the cascade's inter-stage ops in isolation (fwd+bwd slopes):
        # bilinear ×4 flow upsample (2 per closure), nearest ×4 (2),
        # channelnorm at full res (6)
        from pcfa_tpu.models.flownet2 import upsample_nearest4
        from pcfa_tpu.ops.channelnorm import channel_norm
        from pcfa_tpu.ops.warp import interpolate_bilinear

        f4 = jnp.asarray(rng.standard_normal((B, H // 4, W // 4, 2)),
                         jnp.float32)

        def bloss(f):
            out = interpolate_bilinear(f.astype(cdtype) * 20.0, (H, W))
            return jnp.mean(out.astype(jnp.float32) ** 2)

        bg = jax.jit(jax.grad(bloss))
        ms = slope_ms_scan(lambda f: f + 1e-6 * bg(f), f4, n_lo, n_hi)
        print(f"{'interp_bilinear x4 (x2)':26s} fwd+bwd  {ms:8.1f} ms/call")

        def nloss(f):
            out = upsample_nearest4(f.astype(cdtype) * 20.0)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        ng = jax.jit(jax.grad(nloss))
        ms = slope_ms_scan(lambda f: f + 1e-6 * ng(f), f4, n_lo, n_hi)
        print(f"{'upsample_nearest4 (x2)':26s} fwd+bwd  {ms:8.1f} ms/call")

        xi = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)

        def closs(x):
            out = channel_norm(x.astype(cdtype))
            return jnp.mean(out.astype(jnp.float32) ** 2)

        cg2 = jax.jit(jax.grad(closs))
        ms = slope_ms_scan(lambda x: x + 1e-6 * cg2(x), xi, n_lo, n_hi)
        print(f"{'channelnorm full-res (x6)':26s} fwd+bwd  {ms:8.1f} ms/call")

    if "corr" in stages:
        from pcfa_tpu.ops.pallas import global_correlation_pallas

        H8, W8 = H // 8, W // 8
        fa = jnp.asarray(rng.standard_normal((B, H8, W8, 256)), cdtype)
        fb = jnp.asarray(rng.standard_normal((B, H8, W8, 256)), cdtype)

        def closs(a):
            out = global_correlation_pallas(a.astype(cdtype), fb, 20, 2)
            return jnp.mean(out.astype(jnp.float32) ** 2)

        cg = jax.jit(jax.grad(closs))

        def cstep(a, cg=cg):
            return a + 1e-6 * cg(a).astype(cdtype)

        ms = slope_ms_scan(cstep, fa, n_lo, n_hi)
        print(f"{'global corr 441ch (C only)':26s} fwd+bwd  {ms:8.1f} ms/call")

    print("done")


if __name__ == "__main__":
    main()
