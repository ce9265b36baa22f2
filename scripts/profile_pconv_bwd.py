#!/usr/bin/env python3
"""Attribute a Pallas small_conv2d fwd+bwd to its dx / dw components.

profile_encoder.py pins layer1 (4 PConv convs + norms) at ~19 ms of the
encoders' 42; this script slope-times one conv at the layer1 shape under
grad-wrt-x-only, grad-wrt-w-only and grad-wrt-both closures, so the next
backward lever (the 9-einsum dw? the stride-1 transpose dx?) is measured,
not guessed. Same chained-dispatch method as profile_chain.py.

Usage: python scripts/profile_pconv_bwd.py [--shape B,H,C,W] [--cout N]
         [--stride S] [--k K]
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
    ap.add_argument("--shape", default="6,188,64,624",
                    help="NHCW input shape (layer1 default)")
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--stride", type=int, default=1)
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--reps", default="2,12")
    args = ap.parse_args()
    B, H, C, W = (int(v) for v in args.shape.split(","))
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.ops.pallas.small_conv import small_conv2d

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} shape={B},{H},{C},{W} "
          f"cout={args.cout} k={args.k} s={args.stride}", file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, H, C, W)), cdtype)
    w0 = jnp.asarray(
        rng.standard_normal((args.k, args.k, C, args.cout)) * 0.05, cdtype)
    b0 = jnp.zeros((args.cout,), cdtype)

    def fwd_only(x):
        y = small_conv2d(x, w0, b0, "relu", args.stride)
        # keep the chain shape-stable: reduce back to input-shaped tensor
        return x + jnp.mean(y.astype(jnp.float32)).astype(x.dtype)

    def gx(x):
        def loss(a):
            y = small_conv2d(a, w0, b0, "relu", args.stride)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
        return x + jax.grad(loss)(x).astype(x.dtype)

    def gw(x):
        def loss(wv):
            y = small_conv2d(x, wv, b0, "relu", args.stride)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
        dw = jax.grad(loss)(w0)
        return x + jnp.mean(dw.astype(jnp.float32)).astype(x.dtype)

    def gboth(x):
        def loss(a, wv):
            y = small_conv2d(a, wv, b0, "relu", args.stride)
            return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6
        da, dw = jax.grad(loss, argnums=(0, 1))(x, w0)
        return x + da.astype(x.dtype) \
            + jnp.mean(dw.astype(jnp.float32)).astype(x.dtype)

    for name, fn in (("fwd only", jax.jit(fwd_only)),
                     ("fwd + dx", jax.jit(gx)),
                     ("fwd + dw", jax.jit(gw)),
                     ("fwd + dx + dw", jax.jit(gboth))):
        ms = slope_ms(fn, x0, n_lo, n_hi)
        print(f"{name:16s} {ms:8.2f} ms/call")
    print("done")


if __name__ == "__main__":
    main()
