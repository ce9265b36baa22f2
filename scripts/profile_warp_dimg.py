#!/usr/bin/env python3
"""Focused A/B of the warp image-gradient formulations on TPU.

`PCFA_WARP_DIMG=scatter` (XLA scatter-add, conflict-serialized ~27 ms at
FlowNet2's full-res warp) vs `sorted` (merge-based sorted splat — sorts +
cumsum + adjacent difference, no scatter). Uses the host-driven chain
(`slope_ms`) rather than the scan wrapper: sort-heavy bodies inside
`lax.scan` have wedged the tunnel's remote compiler.

Also cross-checks the two formulations' dimg numerically at the real size
(the parity tests cover small shapes; this catches fp32 cumsum
cancellation at N=491k).

Usage: python scripts/profile_warp_dimg.py [--size HxW] [--modes a,b]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_chain import slope_ms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="384x1280")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", default="2,10")
    ap.add_argument("--modes", default="sorted,scatter")
    ap.add_argument("--check", action="store_true",
                    help="numeric sorted-vs-scatter dimg check at full size")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.ops.warp import resample2d

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} batch={B} "
          f"size={H}x{W} reps={n_lo},{n_hi}", file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    img0 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
    f0 = jnp.asarray(rng.standard_normal((B, H, W, 2)) * 4, jnp.float32)

    def make_grad(mode):
        os.environ["PCFA_WARP_DIMG"] = mode

        def wloss(pair):
            flow, im = pair
            out = resample2d(im.astype(cdtype), flow.astype(cdtype))
            return jnp.mean(out.astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(wloss))

    if args.check:
        outs = {}
        for mode in args.modes.split(","):
            gf, gi = make_grad(mode)((f0, img0))
            outs[mode] = (np.asarray(gf, np.float32),
                          np.asarray(gi, np.float32))
        ref = outs.get("scatter") or next(iter(outs.values()))
        for mode, (gf, gi) in outs.items():
            for name, a, b in (("dflow", ref[0], gf), ("dimg", ref[1], gi)):
                denom = np.abs(a).max() or 1.0
                rel = np.abs(a - b).max() / denom
                print(f"check {mode:12s} {name}: max|Δ|/max|ref| = {rel:.3e}")

    for mode in args.modes.split(","):
        wg = make_grad(mode)

        def wstep(pair, wg=wg):
            gf, gi = wg(pair)
            return (pair[0] + 1e-3 * gf, pair[1] + 1e-3 * gi)

        ms = slope_ms(wstep, (f0, img0), n_lo, n_hi)
        print(f"{'resample2d dflow+dimg ' + mode:30s} {ms:8.1f} ms/call")

    print("done")


if __name__ == "__main__":
    main()
