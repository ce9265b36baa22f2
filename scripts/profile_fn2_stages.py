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

from profile_chain import slope_ms_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="384x1280")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", default="2,10")
    ap.add_argument("--stages", default="subnets,warp,corr",
                    help="comma list: subnets,warp,corr")
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
