#!/usr/bin/env python3
"""End-to-end bf16-vs-fp32 attack-quality comparison (the precision lever).

Runs the SAME full PCFA optimization (published config: steps=20,
max_iter=10, delta_bound=0.005, clipping, zero target) twice — once with
matmul precision 'highest' (fp32 accumulation of fp32 operands) and once
with 'default' (bf16 operands on the MXU) — and reports the final attack
metrics side by side. This quantifies what the PCFA_MATMUL_PRECISION knob
trades: the attack *quality* is measured by aee_adv_tgt (how close the
attacked prediction gets to the target) and l2_delta12 (perturbation size),
not by bitwise trajectory identity, so a small relative deviation here means
bf16 is safe to use for throughput.

Random (damped) weights; synthetic inputs. Usage:
    python scripts/validate_precision.py [--size HxW] [--steps N] [--net M]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("PCFA_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")


def damp_flow_head(params, factor=0.01):
    """Scale flow_head.conv2 like the parity fixtures: random-weight
    RAFT-family recurrences diverge over iterations otherwise (CLAUDE.md)."""

    def rec(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if k == "flow_head" and isinstance(v, dict) and "conv2" in v:
                v = dict(v)
                v["conv2"] = {kk: vv * factor for kk, vv in v["conv2"].items()}
                out[k] = v
            else:
                out[k] = rec(v)
        return out

    return rec(params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="376x1248")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--max_iter", type=int, default=10)
    ap.add_argument("--net", default="RAFT")
    ap.add_argument("--chunk", type=int, default=5)
    ap.add_argument("--corr-impl", default="materialized",
                    choices=["materialized", "fused"])
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))

    import jax
    import jax.numpy as jnp

    from pcfa_tpu.attack.pcfa import PCFAConfig, pcfa_init, pcfa_outer_step
    from pcfa_tpu.models import make_model

    print("device:", jax.devices()[0].device_kind, file=sys.stderr)

    # registry defaults carry the adapter's per-net iteration counts
    # (RAFT 12, GMA 6 — `ownutilities.py:324,327`)
    overrides = {}
    if args.corr_impl != "materialized":
        overrides["corr_impl"] = args.corr_impl
    model, spec = make_model(args.net, **overrides)
    d = spec.pad_divisor
    H = ((H + d - 1) // d) * d
    W = ((W + d - 1) // d) * d

    rng = np.random.default_rng(0)
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]
    params = damp_flow_head(params)
    x1 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, H, W, 3)), jnp.float32)
    target = jnp.zeros((1, H, W, 2), jnp.float32)

    cfg = PCFAConfig(steps=args.steps, max_iter=args.max_iter,
                     delta_bound=0.005, boxconstraint="clipping")

    def run(precision, cdtype=None, hdtype=None):
        run_cfg = (dataclasses.replace(cfg, lbfgs_history_dtype=hdtype)
                   if hdtype else cfg)
        with jax.default_matmul_precision(precision):
            def flow_fn_p(prm, a, b):
                if cdtype:
                    prm = jax.tree.map(lambda t: t.astype(cdtype), prm)
                    a, b = a.astype(cdtype), b.astype(cdtype)
                out = model.apply({"params": prm}, a, b)
                out = out[-1] if isinstance(out, tuple) else out
                return out.astype(jnp.float32)

            def chunk_fn(prm, a, b, t, fpi, s):
                fn = functools.partial(flow_fn_p, prm)

                def body(s, _):
                    s, metrics, _ = pcfa_outer_step(fn, a, b, t, fpi, s,
                                                    run_cfg)
                    return s, metrics

                return jax.lax.scan(body, s, None, length=args.chunk)

            init_jit = jax.jit(lambda prm, a, b: pcfa_init(
                functools.partial(flow_fn_p, prm), a, b, run_cfg))
            step_jit = jax.jit(chunk_fn, donate_argnums=(5,))

            t0 = time.perf_counter()
            state, fpi = init_jit(params, x1, x2)
            last = None
            for _ in range(-(-args.steps // args.chunk)):
                state, metrics = step_jit(params, x1, x2, target, fpi, state)
                last = metrics
            out = {k: float(getattr(last, k)[-1]) for k in
                   ("aee_adv_tgt", "aee_adv_pred", "l2_delta12",
                    "aee_adv_tgt_min", "l2_delta12_min", "loss")}
            out["wall_s"] = time.perf_counter() - t0
            return out

    configs = {
        "highest": ("highest", None, None),
        "default": ("default", None, None),
        "bf16-compute": ("default", "bfloat16", None),
        "bf16-all": ("default", "bfloat16", "bfloat16"),
    }
    results = {}
    for name, (precision, cdtype, hdtype) in configs.items():
        results[name] = run(precision, cdtype, hdtype)
        r = results[name]
        print(f"[{name:12s}] " + "  ".join(
            f"{k}={v:.6g}" for k, v in r.items()))

    hi = results["highest"]
    for name in ("default", "bf16-compute", "bf16-all"):
        for k in ("aee_adv_tgt_min", "l2_delta12_min"):
            ref = abs(hi[k]) or 1.0
            print(f"rel diff [{name}] {k}: "
                  f"{abs(hi[k] - results[name][k]) / ref:.4%}")


if __name__ == "__main__":
    main()
