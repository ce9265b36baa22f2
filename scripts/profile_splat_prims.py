#!/usr/bin/env python3
"""Primitive costs for a sorted-splat dimg (scatter-free warp backward).

The measured FlowNet2 bottleneck is the warp's image-gradient scatter-add:
XLA serializes conflicting rows (~27 ms per full-res warp, 4 warps per
cascade closure). A sorted-splat pipeline replaces it with
  sort_key_val → row gather → cumsum → unique-index scatters,
all of which should vectorize. This script slope-times each primitive at
the real shapes (N = 384·1280 queries, K = 4C = 12, P = 385·1281 cells)
so the pipeline budget is known BEFORE building it.

Usage: python scripts/profile_splat_prims.py [--size HxW]
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
    ap.add_argument("--reps", default="2,10")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} size={H}x{W}",
          file=sys.stderr)

    N = H * W
    K = 12
    P = (H + 1) * (W + 1)
    rng = np.random.default_rng(0)

    keys0 = jnp.asarray(rng.integers(0, P, size=(N,)), jnp.int32)
    upd0 = jnp.asarray(rng.standard_normal((N, K)), jnp.float32)

    # 1. sort_key_val int32/int32 at N
    def s_sort(keys):
        ks, perm = jax.lax.sort_key_val(keys, jnp.arange(N, dtype=jnp.int32))
        return keys + ks[:1] + perm[:1]  # keep dependency, same shape carry

    ms = slope_ms_scan(jax.jit(s_sort), keys0, n_lo, n_hi)
    print(f"{'sort_key_val i32 N':26s} {ms:8.2f} ms/call")

    # 2. row gather (N, K) by permutation
    perm0 = jnp.asarray(rng.permutation(N), jnp.int32)

    def s_gather(u):
        return u[perm0] + u[:1]

    ms = slope_ms_scan(jax.jit(s_gather), upd0, n_lo, n_hi)
    print(f"{'row gather (N,12)':26s} {ms:8.2f} ms/call")

    # 3. cumsum over axis 0 of (N, K) fp32
    def s_cumsum(u):
        c = jnp.cumsum(u, axis=0)
        return u + c[-1:] * 1e-9

    ms = slope_ms_scan(jax.jit(s_cumsum), upd0, n_lo, n_hi)
    print(f"{'cumsum (N,12) fp32':26s} {ms:8.2f} ms/call")

    # 4. unique-index scatter-set of (N,) rows into (P+N, K)
    uniq0 = jnp.asarray(rng.permutation(P + N)[:N], jnp.int32)

    def s_scatter(u):
        buf = jnp.zeros((P + N, K), jnp.float32)
        buf = buf.at[uniq0].set(u, mode="promise_in_bounds",
                                unique_indices=True)
        return u + buf[:1] * 1e-9

    ms = slope_ms_scan(jax.jit(s_scatter), upd0, n_lo, n_hi)
    print(f"{'unique scatter-set (P+N,12)':26s} {ms:8.2f} ms/call")

    # 5. reference: the conflicting scatter-add this would replace
    def s_scatter_add(u):
        buf = jnp.zeros((P, K), jnp.float32)
        buf = buf.at[keys0].add(u, mode="promise_in_bounds")
        return u + buf[:1] * 1e-9

    ms = slope_ms_scan(jax.jit(s_scatter_add), upd0, n_lo, n_hi)
    print(f"{'conflicting scatter-add':26s} {ms:8.2f} ms/call")

    print("done")


if __name__ == "__main__":
    main()
