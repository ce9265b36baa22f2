#!/usr/bin/env python3
"""Slope-based dissection of FlowNetFusion's internal stages on TPU.

Round-4 attribution made Fusion the most expensive cascade member
(22.8 ms fwd+bwd at 384×1280 — more than FlowNetC) despite tiny analytic
FLOPs: it is the only subnet whose decode tail runs at FULL resolution
with lane-starved channel counts (deconv0 → 16 ch, inter_conv0 82→16,
predict_flow0 16→2). This script attributes the cost by timing PREFIXES
of the Fusion graph (chain-slope, fwd+bwd); adjacent differences give the
marginal cost of each stage group:

  enc1   conv0 + conv1 + conv1_1              (full-res Pallas head)
  enc2   + conv2/conv2_1 + flow2 head          (÷4, XLA NHWC — MXU-fine)
  half   + deconv1 + inter_conv1 + flow1 head  (÷2, XLA NHWC)
  full   + deconv0 + inter_conv0 + flow0 head  (full-res tail, XLA NHWC)

Usage: python scripts/profile_fusion.py [--size HxW] [--batch B]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from profile_chain import slope_ms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="384x1280")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", default="2,10")
    ap.add_argument("--stages", default="enc1,enc2,half,full")
    args = ap.parse_args()
    H, W = (int(v) for v in args.size.split("x"))
    B = args.batch
    n_lo, n_hi = (int(v) for v in args.reps.split(","))

    os.environ.setdefault("PCFA_MATMUL_PRECISION", "default")

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pcfa_tpu.config import RuntimeConfig
    from pcfa_tpu.models import flownet2 as fn2

    RuntimeConfig().apply()
    dev = jax.devices()[0]
    print(f"device: {dev.platform}:{dev.device_kind} batch={B} "
          f"size={H}x{W} reps={n_lo},{n_hi}", file=sys.stderr)
    cdtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    class FusionPrefix(nn.Module):
        """FlowNetFusion (`models/flownet2.py:FlowNetFusion`) truncated
        after a named stage group; layer names match the full module."""

        upto: str

        @nn.compact
        def __call__(self, x):
            ch = fn2._chain_nhcw()
            out_conv0 = fn2.CL(64, name="conv0")(x)
            out_conv1 = fn2.CL(128, name="conv1_1")(
                fn2.CL(64, 3, 2, name="conv1")(out_conv0, nhcw_out=ch),
                nhcw_in=ch)
            if self.upto == "enc1":
                return out_conv1
            out_conv2 = fn2.CL(128, name="conv2_1")(
                fn2.CL(128, 3, 2, name="conv2")(out_conv1))
            flow2 = fn2.predict_flow("predict_flow2")(out_conv2)
            if self.upto == "enc2":
                return flow2
            flow2_up = fn2.upflow_deconv(2, True, "upsampled_flow2_to_1")(flow2)
            out_deconv1 = fn2.Deconv(32, name="deconv1")(out_conv2)
            concat1 = jnp.concatenate([out_conv1, out_deconv1, flow2_up], -1)
            inter1 = fn2.IConv(32, name="inter_conv1")(concat1)
            flow1 = fn2.predict_flow("predict_flow1")(inter1)
            if self.upto == "half":
                return flow1
            flow1_up = fn2.upflow_deconv(2, True, "upsampled_flow1_to_0")(flow1)
            out_deconv0 = fn2.Deconv(16, name="deconv0")(concat1)
            if self.upto == "deconv0":
                return out_deconv0 + flow1_up.sum()
            concat0 = jnp.concatenate([out_conv0, out_deconv0, flow1_up], -1)
            inter0 = fn2.IConv(16, name="inter_conv0")(concat0)
            if self.upto == "inter0":
                return inter0
            return fn2.predict_flow("predict_flow0")(inter0)

    x0 = jnp.asarray(rng.random((B, H, W, 11)), jnp.float32)
    prev = 0.0
    for upto in args.stages.split(","):
        module = FusionPrefix(upto=upto)
        params = jax.tree.map(
            lambda t: t.astype(cdtype),
            module.init(jax.random.PRNGKey(0), x0.astype(cdtype)))

        def loss(x, module=module, params=params):
            out = module.apply(params, x.astype(cdtype))
            return jnp.mean(out.astype(jnp.float32) ** 2)

        g = jax.jit(jax.grad(loss))

        def step(x, g=g):
            return x + 1e-3 * g(x)

        ms = slope_ms(step, x0, n_lo, n_hi)
        print(f"fusion[{upto:5s}] fwd+bwd {ms:8.2f} ms/call "
              f"(+{ms - prev:6.2f})")
        prev = ms

    print("done")


if __name__ == "__main__":
    main()
