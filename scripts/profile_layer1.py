#!/usr/bin/env python3
"""Attribute layer1's ~19 ms (profile_encoder.py) between PConv convs,
instance norms and residual glue: slope-time grad-wrt-input closures of
(a) one PConv, (b) one instance_norm, (c) one full NHCW ResidualBlock,
(d) layer1 = two blocks, at the layer1 shape (6, 188, 64, 624).

Usage: python scripts/profile_layer1.py [--shape B,H,C,W]
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
    ap.add_argument("--reps", default="2,12")
    args = ap.parse_args()
    B, H, C, W = (int(v) for v in args.shape.split(","))
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models.layers import ResidualBlock, instance_norm
    from pcfa_tpu.ops.pallas.small_conv import small_conv2d

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} shape={B},{H},{C},{W}",
          file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, H, C, W)), cdtype)
    w0 = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, cdtype)
    b0 = jnp.zeros((C,), cdtype)

    blk = ResidualBlock(C, "instance", 1, nhcw=True)
    pblk = jax.tree.map(lambda t: t.astype(cdtype),
                        blk.init(jax.random.PRNGKey(0), x0)["params"])

    def g_of(f):
        def step(x):
            return x + jax.grad(
                lambda a: jnp.sum(f(a).astype(jnp.float32) ** 2) * 1e-6)(x
                ).astype(x.dtype)
        return jax.jit(step)

    cases = [
        ("PConv (conv only)",
         lambda a: small_conv2d(a, w0, b0, None, 1)),
        ("instance_norm", lambda a: instance_norm(a, nhcw=True)),
        ("conv + norm + relu",
         lambda a: jax.nn.relu(
             instance_norm(small_conv2d(a, w0, b0, None, 1), nhcw=True))),
        ("ResidualBlock (x1)",
         lambda a: blk.apply({"params": pblk}, a)),
        ("layer1 (2 blocks)",
         lambda a: blk.apply(
             {"params": pblk}, blk.apply({"params": pblk}, a))),
    ]
    for name, f in cases:
        ms = slope_ms_scan(g_of(f), x0, n_lo, n_hi)
        print(f"{name:22s} {ms:8.2f} ms/call")
    print("done")


if __name__ == "__main__":
    main()
