#!/usr/bin/env python3
"""A/B the separable-matmul corr-lookup's association order on TPU.

Per query the lookup computes win = wy @ cmap @ wxT (9x47 @ 47x156 @ 156x9
at KITTI level 0). Batched tiny matmuls are MXU-PASS-bound: every per-query
matmul burns ceil(M/128)*ceil(K/128)*ceil(N/128) full passes at ~2%
utilization, so the association order sets the pass count:

  left-first  (wy@cmap)@wxT: fwd 2+2, bwd 8  passes/query (level 0)
  right-first wy@(cmap@wxT): fwd 2+1, bwd 6  passes/query

This slope-times fwd and fwd+bwd of one full 4-level lookup per variant at
the bench shape. Usage: python scripts/profile_lookup_forms.py [--size HxW]
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
    ap.add_argument("--size", default="47x156", help="level-0 H2xW2 (/8 res)")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--reps", default="2,12")
    args = ap.parse_args()
    H2, W2 = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.ops import correlation as corr

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} B={B} lvl0={H2}x{W2}",
          file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    N = B * H2 * W2
    pyramid = []
    h, w = H2, W2
    for _ in range(4):
        pyramid.append(jnp.asarray(
            rng.standard_normal((N, h, w, 1)) * 0.1, cdtype))
        h, w = h // 2, w // 2
    # make level shapes (B*H1*W1, Hl, Wl, 1) like corr_pyramid output
    coords0 = np.stack(np.meshgrid(np.arange(W2), np.arange(H2),
                                   indexing="xy"), -1).astype(np.float32)
    coords = jnp.asarray(np.tile(coords0[None], (B, 1, 1, 1))
                         + rng.random((B, H2, W2, 2)) * 3.0)

    variants = [("mm (left-first)", corr.corr_lookup_mm)]
    if hasattr(corr, "corr_lookup_mm_rf"):
        variants.append(("mm_rf (right-first)", corr.corr_lookup_mm_rf))

    # the pyramid rides in the chain carry: a closed-over device array
    # becomes a captured CONSTANT in the jitted scan and blows the tunnel's
    # remote-compile payload limit (HTTP 413 — the round-1 params lesson)
    pyr_t = tuple(pyramid)

    for name, fn in variants:
        def fwd_step(state, fn=fn):
            c, pyr = state
            out = fn(list(pyr), c, 4)
            return (c + 1e-3 * jnp.mean(
                out.astype(jnp.float32)).astype(c.dtype), pyr)

        def bwd_step(state, fn=fn):
            # grad wrt coords AND the pyramid: the attack consumes dcmap
            # (features are functions of the input), so the dcmap matmuls
            # must not be DCE'd out of the measurement
            c, pyr = state
            def loss(cc, p):
                out = fn(list(p), cc, 4)
                return jnp.sum(out.astype(jnp.float32) ** 2) * 1e-6
            dc, dpyr = jax.grad(loss, argnums=(0, 1))(c, pyr)
            extra = sum(jnp.mean(p.astype(jnp.float32)) for p in dpyr)
            return (c + 1e-3 * dc + extra.astype(c.dtype), pyr)

        ms_f = slope_ms_scan(fwd_step, (coords, pyr_t), n_lo, n_hi)
        ms_fb = slope_ms_scan(bwd_step, (coords, pyr_t), n_lo, n_hi)
        print(f"{name:22s} fwd {ms_f:6.2f}   fwd+bwd {ms_fb:6.2f} ms/lookup")
    print("done")


if __name__ == "__main__":
    main()
