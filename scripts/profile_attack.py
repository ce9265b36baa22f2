#!/usr/bin/env python3
"""Component timing for the PCFA/RAFT hot path on the current accelerator.

Times, fenced, at KITTI-size (376x1248):
  * RAFT forward
  * RAFT forward+backward wrt inputs (the L-BFGS closure)
  * one L-BFGS iteration (closure + two-loop recursion + update)
  * corr volume build and corr lookup in isolation

Usage: python scripts/profile_attack.py [--size HxW] [--iters N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("PCFA_CPU"):
    # must precede any backend-touching jax call; env vars alone do not
    # override the session's axon TPU plugin (see tests/conftest.py)
    import jax

    jax.config.update("jax_platforms", "cpu")


def fenced(fn, *args, n=3):
    """NOTE: through tunneled backends block_until_ready does not wait;
    fetch one scalar to force completion. The fetch adds a fixed roundtrip
    (~0.5s on axon) — treat small absolute numbers as upper bounds."""
    import jax
    import jax.numpy as jnp

    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf.ravel()[:1]))

    fence(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fence(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="376x1248")
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.attack.lbfgs import lbfgs_init, lbfgs_iteration
    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models import make_model
    from pcfa_tpu.ops.correlation import (
        allpairs_correlation,
        corr_lookup,
        corr_lookup_mm,
        corr_pyramid,
    )

    RuntimeConfig().apply()
    print("device:", jax.devices()[0].device_kind, file=sys.stderr)

    model, _ = make_model("RAFT", iters=args.iters)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x1, x2)["params"]

    def fwd(a, b):
        return model.apply({"params": params}, a, b)[1]

    fwd_j = jax.jit(fwd)
    print(f"forward:          {fenced(fwd_j, x1, x2)*1e3:9.1f} ms")

    def loss(a, b):
        return jnp.mean(fwd(a, b) ** 2)

    grad_j = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))
    print(f"forward+backward: {fenced(grad_j, x1, x2)*1e3:9.1f} ms")

    # one full L-BFGS iteration (closure + direction + update)
    n = 2 * H * W * 3

    def vag(x):
        a = x[: n // 2].reshape(1, H, W, 3)
        b = x[n // 2:].reshape(1, H, W, 3)
        v, (ga, gb) = jax.value_and_grad(loss, argnums=(0, 1))(a, b)
        return v, jnp.concatenate([ga.ravel(), gb.ravel()])

    state = lbfgs_init(jnp.concatenate([x1.ravel(), x2.ravel()]), 100)
    it_j = jax.jit(lambda s: lbfgs_iteration(vag, s, jnp.asarray(5))[0])
    print(f"lbfgs iteration:  {fenced(it_j, state)*1e3:9.1f} ms")

    # correlation internals at /8 feature scale
    H8, W8, C = H // 8, W // 8, 256
    f1 = jnp.asarray(rng.random((1, H8, W8, C)), jnp.float32)
    f2 = jnp.asarray(rng.random((1, H8, W8, C)), jnp.float32)
    vol_j = jax.jit(lambda a, b: allpairs_correlation(a, b))
    print(f"allpairs volume:  {fenced(vol_j, f1, f2)*1e3:9.1f} ms")

    pyr = jax.jit(lambda a, b: tuple(corr_pyramid(allpairs_correlation(a, b))))(f1, f2)
    coords = jnp.asarray(
        np.stack(np.meshgrid(np.arange(W8), np.arange(H8), indexing="xy"), -1)
        [None].astype(np.float32)
    ) + 0.37
    look_j = jax.jit(lambda p, c: corr_lookup(list(p), c))
    print(f"corr lookup (gather): {fenced(look_j, pyr, coords)*1e3:9.1f} ms")
    lookmm_j = jax.jit(lambda p, c: corr_lookup_mm(list(p), c))
    print(f"corr lookup (matmul): {fenced(lookmm_j, pyr, coords)*1e3:9.1f} ms")
    lookg_j = jax.jit(jax.grad(lambda p, c: jnp.sum(corr_lookup_mm(list(p), c)**2), argnums=0))
    print(f"corr lookup mm bwd:   {fenced(lookg_j, pyr, coords)*1e3:9.1f} ms")


if __name__ == "__main__":
    main()
