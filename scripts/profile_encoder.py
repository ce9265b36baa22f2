#!/usr/bin/env python3
"""Per-stage fwd+bwd attribution INSIDE the RAFT BasicEncoder.

profile_base2.py pins the encoders at ~41 ms of the closure (its biggest
stage); this script slope-times grad closures truncated after each encoder
stage (stem+norm / layer1 / layer2 / layer3 / conv2) under the bench stack
(bf16, batch = the closure's 6 encoder applications), so the next encoder
lever is measured, not guessed. Same chained-dispatch slope method as
profile_chain.py (tunnel-overhead-immune).

Usage: python scripts/profile_encoder.py [--size HxW] [--batch B]
         [--norm instance|batch] [--encoder-pallas 0|1]
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
    ap.add_argument("--batch", type=int, default=6,
                    help="encoder applications per closure: 4 fnet + 2 cnet")
    ap.add_argument("--reps", default="2,12")
    ap.add_argument("--norm", default="instance")
    ap.add_argument("--encoder-pallas", default=None)
    args = ap.parse_args()
    if args.encoder_pallas is not None:
        os.environ["PCFA_PALLAS_ENCODER"] = args.encoder_pallas
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models.layers import BasicEncoder

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} batch={B} "
          f"size={H}x{W} norm={args.norm} "
          f"pallas_enc={os.environ.get('PCFA_PALLAS_ENCODER', '1')}",
          file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)

    enc = BasicEncoder(output_dim=256, norm_fn=args.norm)
    params = jax.tree.map(
        lambda t: t.astype(cdtype),
        enc.init(jax.random.PRNGKey(0), x0[:1])["params"])

    names = ["stem+norm", "+layer1 (2 blocks, 64ch)",
             "+layer2 (96ch /2)", "+layer3 (128ch /2)", "+conv2 (1x1 256)"]
    prev = 0.0
    for depth, name in enumerate(names, 1):
        d = None if depth == 5 else depth

        def loss(a, d=d):
            out = enc.apply({"params": params}, a.astype(cdtype), depth=d)
            return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6

        g = jax.jit(jax.grad(loss))

        def gstep(a):
            return a + 1e-6 * g(a)

        ms = slope_ms(gstep, x0, n_lo, n_hi)
        print(f"{name:28s} {ms:8.1f} ms/call   (+{ms - prev:6.1f})")
        prev = ms
    print("done")


if __name__ == "__main__":
    main()
