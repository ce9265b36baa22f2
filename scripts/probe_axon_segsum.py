#!/usr/bin/env python3
"""Axon-tunnel execute-crash bisection probes (round 5).

Context: the FlowNet2 attack step compiled with PCFA_WARP_DIMG=onehot (or
onehot_scan) crashes the axon client at EXECUTE time — Rust panic at
axon_host/src/axon_types/client.rs:2008, "index out of bounds: the len is
246 but the index is 246" (246 = the step program's flat arg count), or
INVALID_ARGUMENT without donation — while the identical program with
PCFA_WARP_DIMG=scatter executes clean, and the optimized executable has
exactly 246 parameters (no hoisted constants) in both modes.

These probes rebuild the suspicious structure piece by piece at bench-like
arg counts: sort / sort+iota / sort+take / searchsorted / the full segsum
executors / the real packed-warp custom-VJP path, each optionally at real
sizes (N=491k), x4 instances, under lax.scan, vmap, donation, and with the
donated state produced by a prior executable. ALL PASS — the crash needs
the full FlowNet2 network content and is therefore filed as an axon client
bug, not a kernel defect. Re-run after axon updates:

    python scripts/probe_axon_segsum.py segpallas donate 491520 493185 4 scan vmap devstate
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
variant = sys.argv[1]
donate = len(sys.argv) > 2 and sys.argv[2] == "donate"
N_ROWS = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
N_CELLS = int(sys.argv[4]) if len(sys.argv) > 4 else 500
REPS = int(sys.argv[5]) if len(sys.argv) > 5 else 1
import jax, jax.numpy as jnp
import numpy as np

NARGS = 240  # dummy param arrays + state ≈ bench's 246 args

def body(state, feature_in):
    k, v = feature_in
    if variant == "none":
        r = jnp.sum(v)
    elif variant == "sort":
        sk, sv = jax.lax.sort_key_val(k, k)
        r = jnp.sum(sv)
    elif variant == "sort_iota":
        iota = jnp.arange(k.shape[0], dtype=jnp.int32)
        sk, perm = jax.lax.sort_key_val(k, iota)
        r = jnp.sum(perm)
    elif variant == "sort_take":
        iota = jnp.arange(k.shape[0], dtype=jnp.int32)
        sk, perm = jax.lax.sort_key_val(k, iota)
        r = jnp.sum(jnp.take(v, perm, axis=0))
    elif variant == "searchsorted":
        r = jnp.sum(jnp.searchsorted(k, jnp.arange(16, dtype=jnp.int32)))
    elif variant == "segscan":
        from pcfa_tpu.ops.pallas.segsum import segment_rows_scan
        r = 0.0
        for i in range(REPS):
            r = r + jnp.sum(segment_rows_scan(k + i, v, N_CELLS))
    elif variant == "segpallas":
        from pcfa_tpu.ops.pallas.segsum import segment_rows_pallas
        r = 0.0
        for i in range(REPS):
            r = r + jnp.sum(segment_rows_pallas(k + i, v, N_CELLS))
    elif variant == "warp":
        import os as _os
        _os.environ["PCFA_WARP_DIMG"] = "onehot"
        from pcfa_tpu.ops.warp import resample2d
        H, W = 384, 1280
        im = jnp.broadcast_to(v[0, 0], (1, H, W, 3)).astype(jnp.bfloat16) * 0 + 0.5
        fl = (jnp.concatenate([k, k])[: H * W * 2].reshape(1, H, W, 2).astype(jnp.bfloat16) % 7) - 3.0

        def loss(im):
            t = 0.0
            for i in range(REPS):
                t = t + jnp.mean(resample2d(im + 0.01 * i, fl).astype(jnp.float32) ** 2)
            return t

        def inner(c, _):
            g = jax.grad(loss)(im + c * 1e-6)
            return c + jnp.sum(g).astype(jnp.float32), None

        r, _ = jax.lax.scan(inner, jnp.float32(0), None, length=3)
    else:
        raise SystemExit(f"unknown variant {variant}")
    return state + r

args = [jnp.full((8, 8), float(i)) for i in range(NARGS)]
k = jnp.asarray(np.random.default_rng(0).integers(0, N_CELLS - 8, N_ROWS).astype(np.int32))
v = jnp.ones((N_ROWS, 12), jnp.float32)

def f(state, kv, *params):
    if len(sys.argv) > 6 and sys.argv[6] == "scan":
        def sbody(c, _):
            return body(c, kv), None
        s, _ = jax.lax.scan(sbody, state, None, length=1)
    else:
        s = body(state, kv)
    return s + sum(p[0, 0] for p in params)

if len(sys.argv) > 8 and sys.argv[8] == "devstate":
    # state produced by a PRIOR executable (like bench init_jit), then
    # consumed + donated by the step program
    mk = jax.jit(lambda a: jnp.sum(a) * 0.0)
    st = mk(v)
    vf = jax.vmap(f, in_axes=(0, (0, 0)) + (None,) * NARGS)
    jf = jax.jit(vf, donate_argnums=(0,) if donate else ())
    out = jf(st[None], (k[None], v[None]), *args)
elif len(sys.argv) > 7 and sys.argv[7] == "vmap":
    vf = jax.vmap(f, in_axes=(0, (0, 0)) + (None,) * NARGS)
    jf = jax.jit(vf, donate_argnums=(0,) if donate else ())
    out = jf(jnp.zeros((1,), jnp.float32), (k[None], v[None]), *args)
else:
    jf = jax.jit(f, donate_argnums=(0,) if donate else ())
    out = jf(jnp.float32(0), (k, v), *args)
print(variant, "donate" if donate else "nodonate", "->", float(jnp.sum(out)))
