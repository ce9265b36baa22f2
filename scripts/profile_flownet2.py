#!/usr/bin/env python3
"""Per-stage timing of the FlowNet2 cascade (VERDICT round-1 next #5).

Times, fenced, at KITTI size (384×1280 padded): each cascade member in
isolation (FlowNetC, FlowNetS×2, FlowNetSD, Fusion) forward and
forward+backward-wrt-input, the 441-ch global correlation, the resample2d
warps, and the full FlowNet2 closure — so the 86 s/pair cost can be
attributed instead of guessed.

Usage: python scripts/profile_flownet2.py [--size HxW] [--dtype bf16|f32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_attack import fenced  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="384x1280")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))

    if args.dtype == "bf16":
        os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models.flownet2 import (
        FlowNet2,
        FlowNetC,
        FlowNetFusion,
        FlowNetS,
        FlowNetSD,
    )
    from pcfa_tpu.ops.warp import resample2d

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} dtype={args.dtype}",
          file=sys.stderr)
    cdtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)

    def time_module(tag, module, in_ch):
        x = jnp.asarray(rng.standard_normal((1, H, W, in_ch)), jnp.float32)
        params = module.init(jax.random.PRNGKey(0), x)["params"]
        if cdtype != jnp.float32:
            params = jax.tree.map(lambda t: t.astype(cdtype), params)
            x = x.astype(cdtype)

        def fwd(p, a):
            return module.apply({"params": p}, a)

        t_f = fenced(jax.jit(fwd), params, x)

        def loss(a, p):
            return jnp.sum(fwd(p, a).astype(jnp.float32) ** 2)

        t_fb = fenced(jax.jit(jax.grad(loss)), x, params)
        print(f"{tag:24s} fwd {t_f * 1e3:8.1f} ms   "
              f"fwd+bwd {t_fb * 1e3:8.1f} ms")

    time_module("FlowNetC (6ch)", FlowNetC(), 6)
    time_module("FlowNetS (12ch)", FlowNetS(), 12)
    time_module("FlowNetSD (6ch)", FlowNetSD(), 6)
    time_module("Fusion (11ch)", FlowNetFusion(), 11)

    # warp at full res
    x2 = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    fl = jnp.asarray(rng.standard_normal((1, H, W, 2)), jnp.float32)
    t = fenced(jax.jit(resample2d), x2, fl)

    def wloss(a, f):
        return jnp.sum(resample2d(a, f) ** 2)

    t_b = fenced(jax.jit(jax.grad(wloss, argnums=(0, 1))), x2, fl)
    print(f"{'resample2d (full res)':24s} fwd {t * 1e3:8.1f} ms   "
          f"fwd+bwd {t_b * 1e3:8.1f} ms")

    # full cascade
    m = FlowNet2()
    x1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x1, x2)["params"]

    def full(p, a, b):
        if cdtype != jnp.float32:
            p = jax.tree.map(lambda t: t.astype(cdtype), p)
            a, b = a.astype(cdtype), b.astype(cdtype)
        return m.apply({"params": p}, a, b).astype(jnp.float32)

    t_f = fenced(jax.jit(full), params, x1, x2)

    def floss(a, b, p):
        return jnp.sum(full(p, a, b) ** 2)

    t_fb = fenced(jax.jit(jax.grad(floss, argnums=(0, 1))), x1, x2, params)
    print(f"{'FlowNet2 full':24s} fwd {t_f * 1e3:8.1f} ms   "
          f"fwd+bwd {t_fb * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
