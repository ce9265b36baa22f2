#!/usr/bin/env python3
"""Per-stage fwd/fwd+bwd attribution of the RAFT attack closure.

The bench's MFU figure (~0.4% of v5e bf16 peak) says the attack is not
FLOPs-bound — this script says *where* the closure time actually goes,
under the exact bench stack (bf16 compute dtype, bf16 matmul precision,
batch, remat mode), so the next lever is measured, not guessed:

  * fnet (both frames, batched)          fwd / fwd+bwd-wrt-input
  * cnet                                 fwd / fwd+bwd
  * allpairs volume + 4-level pyramid    fwd / fwd+bwd
  * ONE refinement iteration (RAFTScanBody: lookup + motion encoder +
    SepConvGRU + flow head + mask head)  fwd / fwd+bwd
  * convex upsampling                    fwd / fwd+bwd
  * full closure at remat off / on / policy, for reconciliation
    (expected ≈ encoders + volume + iters×iteration + upsample)

Usage: python scripts/profile_raft_stages.py [--size HxW] [--batch B]
         [--iters N] [--dtype bf16|f32]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_attack import fenced  # noqa: E402

if os.environ.get("PCFA_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="376x1248")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--dtype", default="bf16", choices=["f32", "bf16"])
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch

    if args.dtype == "bf16":
        os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models import make_model
    from pcfa_tpu.models.layers import BasicEncoder
    from pcfa_tpu.models.raft import RAFTScanBody, upsample_flow_convex
    from pcfa_tpu.ops.correlation import allpairs_correlation, corr_pyramid
    from pcfa_tpu.ops.warp import coords_grid

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} dtype={args.dtype} "
          f"batch={B} size={H}x{W}", file=sys.stderr)
    cdtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)

    def cast(tree):
        return jax.tree.map(lambda t: t.astype(cdtype), tree)

    def stage(tag, module, *xs, grad_argnums=0):
        """Time module.apply fwd and grad-wrt-first-input, fenced."""
        params = cast(module.init(jax.random.PRNGKey(0), *xs)["params"])
        xs = tuple(x.astype(cdtype) for x in xs)
        f = jax.jit(lambda p, *a: module.apply({"params": p}, *a))

        def loss(x0, p, rest):
            out = module.apply({"params": p}, x0, *rest)
            return sum(jnp.sum(leaf.astype(jnp.float32) ** 2)
                       for leaf in jax.tree.leaves(out))

        g = jax.jit(jax.grad(loss))
        t_f = fenced(f, params, *xs)
        t_b = fenced(g, xs[0], params, xs[1:])
        print(f"{tag:34s} fwd {t_f * 1e3:8.1f} ms   fwd+bwd {t_b * 1e3:8.1f} ms")
        return t_f, t_b

    # --- encoders (input = both frames stacked like RAFT.__call__) ---
    x2B = jnp.asarray(rng.random((2 * B, H, W, 3)) * 2 - 1, jnp.float32)
    xB = x2B[:B]
    stage("fnet (2 frames, instance norm)",
          BasicEncoder(output_dim=256, norm_fn="instance"), x2B)
    stage("cnet (1 frame, batch norm)",
          BasicEncoder(output_dim=256, norm_fn="batch"), xB)

    # --- volume + pyramid ---
    H8, W8 = H // 8, W // 8
    f1 = jnp.asarray(rng.standard_normal((B, H8, W8, 256)), cdtype)
    f2 = jnp.asarray(rng.standard_normal((B, H8, W8, 256)), cdtype)

    def vol_pyr(a, b):
        return tuple(corr_pyramid(allpairs_correlation(a, b)))

    t = fenced(jax.jit(vol_pyr), f1, f2)
    gv = jax.jit(jax.grad(
        lambda a, b: sum(jnp.sum(l.astype(jnp.float32) ** 2)
                         for l in vol_pyr(a, b))))
    tb = fenced(gv, f1, f2)
    print(f"{'allpairs volume + pyramid':34s} fwd {t * 1e3:8.1f} ms   "
          f"fwd+bwd {tb * 1e3:8.1f} ms")

    # --- one refinement iteration ---
    pyr = jax.jit(vol_pyr)(f1, f2)
    net = jnp.asarray(rng.standard_normal((B, H8, W8, 128)), cdtype)
    inp = jnp.asarray(rng.standard_normal((B, H8, W8, 128)), cdtype)
    coords0 = jnp.tile(coords_grid(1, H8, W8), (B, 1, 1, 1))
    coords1 = coords0 + 0.37
    body = RAFTScanBody()
    carry = (net, coords1)
    const = (inp, coords0, pyr)
    bparams = cast(body.init(jax.random.PRNGKey(0), carry, const)["params"])
    it_f = jax.jit(lambda p, c, k: body.apply({"params": p}, c, k))

    def it_loss(c, p, k):
        # mask head is hoisted out of the scan body (returns ys=None)
        (n2, c2), _ = body.apply({"params": p}, c, k)
        return jnp.sum(n2.astype(jnp.float32) ** 2) + jnp.sum(c2 ** 2)

    it_g = jax.jit(jax.grad(it_loss))
    t_f = fenced(it_f, bparams, carry, const)
    t_b = fenced(it_g, carry, bparams, const)
    print(f"{'one iteration (lookup+enc+GRU+heads)':34s} fwd {t_f * 1e3:8.1f} ms"
          f"   fwd+bwd {t_b * 1e3:8.1f} ms   (x{args.iters} iters)")

    # --- convex upsampling ---
    flow_lr = jnp.asarray(rng.standard_normal((B, H8, W8, 2)), jnp.float32)
    mask = jnp.asarray(rng.standard_normal((B, H8, W8, 576)), cdtype)
    up_f = jax.jit(upsample_flow_convex)
    t_f = fenced(up_f, flow_lr, mask)
    up_g = jax.jit(jax.grad(
        lambda fl, m: jnp.sum(upsample_flow_convex(fl, m) ** 2)))
    t_b = fenced(up_g, flow_lr, mask)
    print(f"{'convex upsample x8':34s} fwd {t_f * 1e3:8.1f} ms   "
          f"fwd+bwd {t_b * 1e3:8.1f} ms")

    # --- full closure per remat mode ---
    for tag, over in (("remat off", {}),
                      ("remat on", {"remat": True}),
                      ("remat policy=dots", {"remat": True,
                                             "remat_policy": "dots"})):
        model, _ = make_model("RAFT", iters=args.iters, **over)
        params = model.init(jax.random.PRNGKey(0), xB[:1, ..., :3] * 0 +
                            xB[:1], xB[:1])["params"]

        def flow_fn(p, a, b):
            p = cast(p)
            a, b = a.astype(cdtype), b.astype(cdtype)
            return model.apply({"params": p}, a, b)[1].astype(jnp.float32)

        a = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
        b = jnp.asarray(rng.random((B, H, W, 3)), jnp.float32)
        g = jax.jit(jax.grad(
            lambda a_, b_: jnp.mean(flow_fn(params, a_, b_) ** 2),
            argnums=(0, 1)))
        try:
            t_b = fenced(g, a, b)
        except Exception as e:  # OOM etc. — record, keep going
            print(f"{'closure ' + tag:34s} FAILED: {type(e).__name__}")
            continue
        print(f"{'closure ' + tag:34s} fwd+bwd {t_b * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
