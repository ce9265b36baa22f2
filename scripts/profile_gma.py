#!/usr/bin/env python3
"""GMA-6it vs RAFT-12it component timing (VERDICT round-1 next #8).

GMA measured SLOWER than RAFT despite half the refinement iterations
(0.0281 vs 0.0326 pairs/s). Times, fenced: full fwd+bwd closures of both
models, the GMA Attention build (N² softmax), one Aggregate application,
and one full scan-iteration equivalent of each model — so the gap is
attributed, not guessed.

Usage: python scripts/profile_gma.py [--size HxW] [--dtype f32|bf16]
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
    ap.add_argument("--size", default="376x1248")
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models import make_model
    from pcfa_tpu.models.gma import Aggregate, Attention

    if args.dtype == "bf16":
        os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")
    RuntimeConfig().apply()
    cdtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} dtype={args.dtype}",
          file=sys.stderr)
    rng = np.random.default_rng(0)

    def closure_time(name, iters):
        model, _ = make_model(name, iters=iters)
        x1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
        x2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), x1, x2)["params"]

        def flow(p, a, b):
            if cdtype != jnp.float32:
                p = jax.tree.map(lambda t: t.astype(cdtype), p)
                a, b = a.astype(cdtype), b.astype(cdtype)
            return model.apply({"params": p}, a, b)[1].astype(jnp.float32)

        t_f = fenced(jax.jit(flow), params, x1, x2)

        def loss(a, b, p):
            return jnp.sum(flow(p, a, b) ** 2)

        t_fb = fenced(jax.jit(jax.grad(loss, argnums=(0, 1))), x1, x2, params)
        print(f"{name}-{iters}it{'':12s} fwd {t_f * 1e3:8.1f} ms   "
              f"fwd+bwd {t_fb * 1e3:8.1f} ms")

    closure_time("RAFT", 12)
    closure_time("GMA", 6)

    # attention build + one aggregate at /8 shapes
    H8, W8 = H // 8, W // 8
    fmap = jnp.asarray(rng.standard_normal((1, H8, W8, 128)), cdtype)
    motion = jnp.asarray(rng.standard_normal((1, H8, W8, 128)), cdtype)

    att_mod = Attention(heads=1, dim_head=128)
    att_params = att_mod.init(jax.random.PRNGKey(0), fmap)["params"]
    # cast params to the compute dtype like the runtime does — fp32 init
    # params would silently promote Q/K and turn the HIGHEST N² einsum
    # into 6-pass fp32 matmuls (the corr-lookup-weights bug class)
    att_params = jax.tree.map(lambda t: t.astype(cdtype), att_params)
    att_fn = jax.jit(lambda p, f: att_mod.apply({"params": p}, f))
    t_att = fenced(att_fn, att_params, fmap)
    attn = att_fn(att_params, fmap)
    print(f"Attention build (N²={H8 * W8}²)   fwd {t_att * 1e3:8.1f} ms   "
          f"dtype {attn.dtype}")

    agg_mod = Aggregate(heads=1, dim_head=128, dim=128)
    agg_params = agg_mod.init(jax.random.PRNGKey(0), attn, motion)["params"]
    agg_params = jax.tree.map(lambda t: t.astype(cdtype), agg_params)
    t_agg = fenced(
        jax.jit(lambda p, a, m: agg_mod.apply({"params": p}, a, m)),
        agg_params, attn, motion,
    )

    def agg_loss(m, p, a):
        return jnp.sum(agg_mod.apply({"params": p}, a, m).astype(jnp.float32) ** 2)

    t_agg_b = fenced(jax.jit(jax.grad(agg_loss)), motion, agg_params, attn)
    print(f"Aggregate (one iteration)    fwd {t_agg * 1e3:8.1f} ms   "
          f"fwd+bwd {t_agg_b * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
