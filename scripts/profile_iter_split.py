#!/usr/bin/env python3
"""Slope-based split of ONE RAFT refinement iteration: lookup vs GRU/heads.

Companion to profile_chain.py (same chained-dispatch method — marginal
per-call cost, constant tunnel overhead cancels). Stages:

  * corr_lookup_mm over the 4-level pyramid (fwd and fwd+bwd-wrt-pyramid)
  * motion encoder + SepConvGRU + flow/mask heads (fwd+bwd)
  * full RAFTScanBody iteration (fwd+bwd), for reconciliation

Usage: python scripts/profile_iter_split.py [--size HxW] [--batch B]
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--reps", default="2,12")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models.raft import (
        BasicMotionEncoder,
        FlowHead,
        RAFTScanBody,
        SepConvGRU,
    )
    from pcfa_tpu.models.layers import tconv
    from pcfa_tpu.ops.correlation import (
        allpairs_correlation,
        corr_lookup_mm,
        corr_lookup_window,
        corr_pyramid,
    )
    from pcfa_tpu.ops.warp import coords_grid

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} batch={B} "
          f"size={H}x{W} reps={n_lo},{n_hi}", file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    H8, W8 = H // 8, W // 8

    def cast(tree):
        return jax.tree.map(lambda t: t.astype(cdtype), tree)

    f1 = jnp.asarray(rng.standard_normal((B, H8, W8, 256)), cdtype)
    f2 = jnp.asarray(rng.standard_normal((B, H8, W8, 256)), cdtype)
    pyr = tuple(jax.jit(
        lambda a, b: tuple(corr_pyramid(allpairs_correlation(a, b))))(f1, f2))
    coords0 = jnp.tile(coords_grid(1, H8, W8), (B, 1, 1, 1))

    # --- lookup forward: chain via coords (tiny carry), pyr as args --------
    look = jax.jit(lambda c, *p: corr_lookup_window(list(p), c))

    def lstep(c):
        out = look(c, *pyr)
        return c + 1e-6 * jnp.mean(out.astype(jnp.float32)) * 0 + 1e-3

    ms = slope_ms(lstep, coords0 + 0.37, n_lo, n_hi)
    _impl = os.environ.get("PCFA_CORR_LOOKUP", "mm")
    print(f"{'corr_lookup ' + _impl + ' fwd':30s} {ms:8.1f} ms/call")

    # --- lookup fwd+bwd wrt pyramid (what the closure's backward does) -----
    lg = jax.jit(jax.grad(
        lambda p0, c, rest: jnp.sum(
            corr_lookup_window([p0, *rest], c).astype(jnp.float32) ** 2)))

    def lgstep(p0):
        return (p0 + 1e-6 * lg(p0, coords0 + 0.37, list(pyr[1:]))
                .astype(p0.dtype))

    ms = slope_ms(lgstep, pyr[0], n_lo, n_hi)
    print(f"{'corr_lookup ' + _impl + ' fwd+bwd':30s} {ms:8.1f} ms/call")

    # --- GRU/heads block (everything after the lookup) ---------------------
    class Tail(nn.Module):
        @nn.compact
        def __call__(self, net, inp, flow, corr):
            motion = BasicMotionEncoder(name="encoder")(flow, corr)
            gru_in = jnp.concatenate([inp, motion], axis=-1)
            net = SepConvGRU(128, name="gru")(net, gru_in)
            delta = FlowHead(256, name="flow_head")(net)
            m = nn.relu(tconv(256, (3, 3), name="mask_conv1")(net))
            mask = 0.25 * tconv(64 * 9, (1, 1), name="mask_conv2")(m)
            return net, delta, mask

    net0 = jnp.asarray(rng.standard_normal((B, H8, W8, 128)), cdtype)
    inp0 = jnp.asarray(rng.standard_normal((B, H8, W8, 128)), cdtype)
    flow0 = jnp.asarray(rng.standard_normal((B, H8, W8, 2)), cdtype)
    corr0 = jnp.asarray(rng.standard_normal((B, H8, W8, 4 * 81)), cdtype)
    tail = Tail()
    tparams = cast(tail.init(jax.random.PRNGKey(0), net0, inp0, flow0,
                             corr0)["params"])

    tg = jax.jit(jax.grad(
        lambda n, c: sum(jnp.sum(o.astype(jnp.float32) ** 2)
                         for o in tail.apply({"params": tparams}, n, inp0,
                                             flow0, c)), argnums=(0, 1)))

    def tstep(nc):
        dn, dc = tg(*nc)
        return (nc[0] + 1e-6 * dn, nc[1] + 1e-6 * dc)

    ms = slope_ms(tstep, (net0, corr0), n_lo, n_hi)
    print(f"{'motion-enc+GRU+heads fwd+bwd':30s} {ms:8.1f} ms/call")

    # --- mask head alone (runs every iteration; only the last mask is used)
    class MaskHead(nn.Module):
        @nn.compact
        def __call__(self, net):
            m = nn.relu(tconv(256, (3, 3), name="mask_conv1")(net))
            return 0.25 * tconv(64 * 9, (1, 1), name="mask_conv2")(m)

    mh = MaskHead()
    mparams = cast(mh.init(jax.random.PRNGKey(0), net0)["params"])
    mg = jax.jit(jax.grad(
        lambda n: jnp.sum(mh.apply({"params": mparams},
                                   n).astype(jnp.float32) ** 2)))

    def mstep(n):
        return n + 1e-6 * mg(n)

    ms = slope_ms(mstep, net0, n_lo, n_hi)
    print(f"{'mask head fwd+bwd':30s} {ms:8.1f} ms/call")

    # --- convex upsample ----------------------------------------------------
    from pcfa_tpu.models.raft import upsample_flow_convex

    flow_lr0 = jnp.asarray(rng.standard_normal((B, H8, W8, 2)), jnp.float32)
    mask0 = jnp.asarray(rng.standard_normal((B, H8, W8, 576)), cdtype)
    ug = jax.jit(jax.grad(
        lambda fl, m: jnp.sum(upsample_flow_convex(fl, m) ** 2),
        argnums=(0, 1)))

    def ustep(fm):
        dfl, dm = ug(*fm)
        return (fm[0] + 1e-6 * dfl, fm[1] + 1e-6 * dm)

    ms = slope_ms(ustep, (flow_lr0, mask0), n_lo, n_hi)
    print(f"{'convex upsample fwd+bwd':30s} {ms:8.1f} ms/call")

    # --- full iteration (reconciliation) ------------------------------------
    body = RAFTScanBody()
    carry0 = (net0, coords0 + 0.37)
    const = (inp0, coords0, pyr)
    bparams = cast(body.init(jax.random.PRNGKey(0), carry0, const)["params"])

    bg = jax.jit(jax.grad(
        lambda carry, ps, cs: sum(
            jnp.sum(jnp.asarray(l, jnp.float32).astype(jnp.float32) ** 2)
            for l in jax.tree.leaves(
                body.apply({"params": ps}, carry, cs))),
    ))

    def bstep(carry):
        dn, dc = bg(carry, bparams, const)
        return (carry[0] + 1e-6 * dn, carry[1] + 1e-6 * dc)

    ms = slope_ms(bstep, carry0, n_lo, n_hi)
    print(f"{'full iteration fwd+bwd':30s} {ms:8.1f} ms/call")

    print("done")


if __name__ == "__main__":
    main()
