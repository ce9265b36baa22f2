#!/usr/bin/env python3
"""Axon probe: small_conv Pallas kernel + segsum (sort/scalar-prefetch
Pallas) in ONE donated program — the combination present in every
closure whose execute crashes the tunnel client (see probe_axon_segsum)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
mode = sys.argv[1] if len(sys.argv) > 1 else "combo"
import numpy as np
import jax, jax.numpy as jnp

from pcfa_tpu.ops.pallas.segsum import segment_rows_pallas
from pcfa_tpu.ops.pallas.small_conv import small_conv2d

N_ROWS, N_CELLS = 491520, 493185
rng = np.random.default_rng(0)
k = jnp.asarray(rng.integers(0, N_CELLS - 8, N_ROWS).astype(np.int32))
v = jnp.ones((N_ROWS, 12), jnp.float32)
x = jnp.asarray(rng.random((1, 384, 3, 1280)), jnp.bfloat16)   # NHCW
kern = jnp.asarray(rng.standard_normal((7, 7, 3, 32)) * 0.1, jnp.bfloat16)
bias = jnp.zeros((32,), jnp.bfloat16)
args = [jnp.full((8, 8), float(i)) for i in range(80)]

def f(state, k, v, x, kern, bias, *params):
    r = 0.0
    if mode in ("combo", "conv"):
        def closs(x):
            return jnp.mean(small_conv2d(x, kern, bias, "leaky", 1).astype(jnp.float32) ** 2)
        g = jax.grad(closs)(x)
        r = r + jnp.sum(g).astype(jnp.float32)
    if mode in ("combo", "seg"):
        r = r + jnp.sum(segment_rows_pallas(k, v, N_CELLS))
    return state + r + sum(p[0, 0] for p in params)

jf = jax.jit(f, donate_argnums=(0,))
out = jf(jnp.float32(0), k, v, x, kern, bias, *args)
print(mode, "->", float(out))
