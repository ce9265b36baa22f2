#!/usr/bin/env python3
"""L-BFGS machinery cost: two-loop vs compact (BNS) direction on TPU.

Times one `lbfgs_iteration` with a trivial closure (so the optimizer
machinery dominates) at the RAFT/KITTI problem size (n = 2·H·W·3 ≈ 2.8M)
with a FULL history ring buffer — the worst case that the two-loop's m
sequential HBM trips hit at torch's default history_size=100. Also checks
direction agreement between the two algorithms at this scale.

Usage: python scripts/profile_lbfgs.py [--size HxW] [--history M]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("PCFA_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="376x1248")
    ap.add_argument("--history", type=int, default=100)
    ap.add_argument("--hdtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="history ring-buffer dtype (bench default: bfloat16)")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.attack.lbfgs import (
        _compact_direction,
        _two_loop,
        lbfgs_init,
        lbfgs_iteration,
    )
    from pcfa_tpu.config import RuntimeConfig

    RuntimeConfig().apply()
    print("device:", jax.devices()[0].device_kind, file=sys.stderr)

    n = 2 * H * W * 3
    m = args.history
    rng = np.random.default_rng(0)

    # a filled, wrapped ring buffer with valid curvature pairs
    hdt = jnp.dtype(args.hdtype)
    state = lbfgs_init(jnp.zeros((n,), jnp.float32), m, history_dtype=hdt)
    y = rng.standard_normal((m, n)).astype(np.float32) * 1e-3
    s = y * rng.uniform(0.5, 2.0, (m, 1)).astype(np.float32)  # y·s > 0
    ys = np.sum(y * s, axis=1)
    state = state._replace(
        y_buf=jnp.asarray(y, hdt),
        s_buf=jnp.asarray(s, hdt),
        ro_buf=jnp.asarray(1.0 / ys),
        h_diag=jnp.asarray(ys[-1] / np.sum(y[-1] * y[-1]), jnp.float32),
        count=jnp.asarray(m + 7, jnp.int32),  # wrapped
        n_iter=jnp.asarray(m + 7, jnp.int32),
        prev_grad=jnp.asarray(rng.standard_normal(n).astype(np.float32)),
        prev_loss=jnp.asarray(1.0, jnp.float32),
        t=jnp.asarray(1.0, jnp.float32),
        d=jnp.asarray(rng.standard_normal(n).astype(np.float32) * 1e-3),
        # incremental-compact path reads the Grams from state
        gram_sy=jnp.asarray(s @ y.T),
        gram_yy=jnp.asarray(y @ y.T),
    )
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # direction agreement at production scale
    d_tl = jax.jit(_two_loop)(g, state.y_buf, state.s_buf, state.ro_buf,
                              state.h_diag, state.count)
    d_cp = jax.jit(_compact_direction)(g, state.y_buf, state.s_buf,
                                       state.h_diag, state.count)
    d_tl, d_cp = np.asarray(d_tl), np.asarray(d_cp)
    denom = np.linalg.norm(d_tl)
    print(f"direction rel-l2 diff (n={n}, m={m}): "
          f"{np.linalg.norm(d_cp - d_tl) / denom:.2e}")

    def cheap_vag(x):
        return 0.5 * jnp.vdot(x, x), x

    def fenced(fn, *a, reps=5):
        out = fn(*a)
        _ = float(jax.tree.leaves(out)[0].ravel()[0])
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = float(jax.tree.leaves(out)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for direction in ("two_loop", "compact"):
        it = jax.jit(lambda st, d=direction: lbfgs_iteration(
            cheap_vag, st, jnp.asarray(5), direction=d)[0].x)
        print(f"lbfgs iteration [{direction:8s}] (full history): "
              f"{fenced(it, state)*1e3:8.1f} ms")

    # --- in-scan cost (donated state, slope-timed): what the attack pays ---
    # A single jitted iteration copies the (m, n) ring buffers on every
    # .at[idx].set (no donation); inside the attack the whole optimization is
    # one scan with donated carry, so row writes are in place. Chain K
    # iterations per device call and report the K-slope.
    def chain(direction, k):
        def body(st, j):
            st, loss = lbfgs_iteration(cheap_vag, st, jnp.mod(j, 10),
                                       direction=direction)
            return st, loss
        f = jax.jit(
            lambda st, k=k: jax.lax.scan(
                body, st, jnp.arange(k, dtype=jnp.int32))[0],
            donate_argnums=0,
        )
        def run(st):
            out = f(st)
            _ = float(out.prev_loss)  # fence with a scalar fetch
            return out
        return run

    for direction in ("two_loop", "compact"):
        k_lo, k_hi = 3, 13
        ts = {}
        for k in (k_lo, k_hi):
            run = chain(direction, k)
            run(jax.tree.map(jnp.copy, state))  # compile
            best = float("inf")
            for _ in range(3):
                st = jax.tree.map(jnp.copy, state)
                t0 = time.perf_counter()
                run(st)
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        slope = (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)
        print(f"lbfgs in-scan  [{direction:8s}] (full history): "
              f"{slope*1e3:8.1f} ms/iteration (donated, slope-timed)")


if __name__ == "__main__":
    main()
