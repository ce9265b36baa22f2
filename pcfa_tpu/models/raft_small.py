"""RAFT-small in Flax (`raft.py:29-51` small=true path).

Smaller encoders (bottleneck blocks), hidden/context 96/64, corr radius 3,
`SmallUpdateBlock` with a plain `ConvGRU` and NO upsampling mask — the final
flow is upsampled with plain ×8 bilinear (`raft.py:134-135`, `upflow8` with
align_corners=True).

Not used by the shipped attack config (`raft_config.json`: small=false) but
part of the reference model family; select with
`make_model("RAFT", small=True)` via the `RAFTSmall` module.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcfa_tpu.models.layers import SmallEncoder, tconv
from pcfa_tpu.models.raft import _remat_body
from pcfa_tpu.ops.correlation import corr_lookup_window, corr_pyramid_pooled
from pcfa_tpu.ops.warp import coords_grid, upflow


class ConvGRU(nn.Module):
    """`update.py:16-31`: single 3×3 GRU pass."""

    hidden_dim: int = 96

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(tconv(self.hidden_dim, (3, 3), name="convz")(hx))
        r = nn.sigmoid(tconv(self.hidden_dim, (3, 3), name="convr")(hx))
        rhx = jnp.concatenate([r * h, x], axis=-1)
        q = nn.tanh(tconv(self.hidden_dim, (3, 3), name="convq")(rhx))
        return (1 - z) * h + z * q


class SmallMotionEncoder(nn.Module):
    """`update.py:62-77` (corr_levels=4, radius=3 → 196 corr channels)."""

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(tconv(96, (1, 1), name="convc1")(corr))
        flo = nn.relu(tconv(64, (7, 7), name="convf1")(flow))
        flo = nn.relu(tconv(32, (3, 3), name="convf2")(flo))
        out = nn.relu(
            tconv(80, (3, 3), name="conv")(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, flow], axis=-1)


class SmallScanBody(nn.Module):
    """One small-update iteration (`update.py:99-112`) as a scan body."""

    hidden_dim: int = 96
    corr_radius: int = 3

    @nn.compact
    def __call__(self, carry, const):
        net, coords1 = carry
        inp, coords0, pyramid = const
        coords1 = jax.lax.stop_gradient(coords1)
        corr = corr_lookup_window(list(pyramid), coords1, self.corr_radius)
        flow = coords1 - coords0
        # keep bf16 compute dtypes from being promoted by the fp32 coords
        corr, flow = corr.astype(net.dtype), flow.astype(net.dtype)
        motion = SmallMotionEncoder(name="encoder")(flow, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, name="gru")(net, gru_in)
        x = nn.relu(tconv(128, (3, 3), name="flow_head_conv1")(net))
        delta_flow = tconv(2, (3, 3), name="flow_head_conv2")(x)
        return (net, coords1 + delta_flow), None


class RAFTSmall(nn.Module):
    """RAFT small=true (`raft.py:29-33,48-51`): hdim 96, cdim 64,
    radius 3, bilinear ×8 output upsampling. Unit-range inputs;
    returns (flow_lowres, flow_up)."""

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 3
    hidden_dim: int = 96
    context_dim: int = 64
    remat: bool = False
    remat_policy: str | None = None  # see models/raft._remat_body

    @nn.compact
    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray):
        x1 = 2.0 * image1 - 1.0
        x2 = 2.0 * image2 - 1.0

        fnet = SmallEncoder(output_dim=128, norm_fn="instance", name="fnet")
        fmaps = fnet(jnp.concatenate([x1, x2], axis=0))
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)

        # per-level pooled-f2 construction — see corr_pyramid_pooled
        pyramid = corr_pyramid_pooled(fmap1, fmap2, self.corr_levels)

        cnet = SmallEncoder(output_dim=self.hidden_dim + self.context_dim,
                            norm_fn="none", name="cnet")(x1)
        net, inp = jnp.split(cnet, [self.hidden_dim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        B, H8, W8, _ = net.shape
        coords0 = coords_grid(B, H8, W8)
        # + 0·net: inherit data-varying-ness so the scan carry type is
        # consistent under shard_map (vma) — a no-op otherwise
        coords1 = coords_grid(B, H8, W8) + 0.0 * net[..., :2]

        body = _remat_body(SmallScanBody, self.remat, self.remat_policy)
        scanned = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            length=self.iters,
        )(self.hidden_dim, self.corr_radius, name="update_block")

        (net, coords1), _ = scanned((net, coords1), (inp, coords0,
                                                     tuple(pyramid)))
        flow_lr = coords1 - coords0
        flow_up = upflow(flow_lr, 8, align_corners=True)  # upflow8
        return flow_lr, flow_up
