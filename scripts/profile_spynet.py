#!/usr/bin/env python3
"""SpyNet conv-path profile: shifted-slab Pallas kernel vs XLA convs.

Times (value-fetch fenced, tunneled-backend caveats apply — see CLAUDE.md):
  * each Basic-block conv shape at level-0 resolution, Pallas vs XLA
  * full SpyNet forward and forward+backward, use_pallas on/off

Usage: python scripts/profile_spynet.py [--size HxW]
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


def fenced(fn, *args, n=3):
    import jax

    def fence(out):
        leaf = jax.tree.leaves(out)[0]
        return float(leaf.ravel()[0])

    fence(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        fence(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="384x1280")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models.spynet import SpyNet
    from pcfa_tpu.ops.pallas.small_conv import conv_reference, small_conv2d

    RuntimeConfig().apply()
    print("device:", jax.devices()[0].device_kind, file=sys.stderr)
    rng = np.random.default_rng(0)

    print(f"-- per-conv (NHCW, {H}x{W}) --")
    for c_in, c_out in ((8, 32), (32, 64), (64, 32), (32, 16), (16, 2)):
        x = jnp.asarray(rng.standard_normal((1, H, c_in, W)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((7, 7, c_in, c_out)) * 0.05,
                        jnp.float32)
        b = jnp.zeros((c_out,), jnp.float32)
        t_pal = fenced(jax.jit(lambda x, w, b: small_conv2d(x, w, b, True)),
                       x, w, b)
        t_xla = fenced(jax.jit(lambda x, w, b: conv_reference(x, w, b, True)),
                       x, w, b)
        print(f"conv {c_in:3d}->{c_out:3d}: pallas {t_pal*1e3:7.1f} ms   "
              f"xla {t_xla*1e3:7.1f} ms   ({t_xla/t_pal:4.1f}x)")

    print("-- full SpyNet --")
    x1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    for use_pallas in (False, True):
        model = SpyNet(use_pallas=use_pallas)
        params = model.init(jax.random.PRNGKey(0), x1, x2)["params"]

        fwd = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b))
        t_f = fenced(fwd, params, x1, x2)

        def loss(p, a, b):
            return jnp.mean(model.apply({"params": p}, a, b) ** 2)

        gr = jax.jit(jax.grad(loss, argnums=(1, 2)))
        t_g = fenced(gr, params, x1, x2)
        tag = "pallas" if use_pallas else "xla   "
        print(f"{tag}: forward {t_f*1e3:7.1f} ms   fwd+bwd {t_g*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
