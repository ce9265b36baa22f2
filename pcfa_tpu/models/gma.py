"""GMA (RAFT + Global Motion Aggregation) in Flax.

Rebuild of `models/gma/{network,gma,update}.py`; the encoders, correlation
pyramid, GRU and upsampling are shared with our RAFT (the reference's
extractor/corr files are byte-identical to RAFT's modulo whitespace).

GMA specifics (shipped config `gma_config.json`: num_heads=1,
position_only=false, position_and_content=false):
* `Attention` (`gma.py:34-76`): 1×1 conv (no bias) → Q,K; content-only
  similarity `softmax(scale·Q·Kᵀ)` over all HW/64 positions, computed ONCE
  from the context features (`network.py:99`).
* `Aggregate` (`gma.py:79-115`): V from motion features, attention-weighted
  sum, residual with learned scalar gain γ (init 0), no projection when
  dim == inner_dim.
* `GMAUpdateBlock` (`update.py:112-139`): GRU input = [inp, motion,
  motion_global] (384 ch + 128 hidden).
* The adapter drives GMA with `iters=6` (`ownutilities.py:327`).

The relative-positional-embedding tables (`gma.py:6-31`) exist in shipped
checkpoints but are dead weights under the shipped config; the converter
skips them.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcfa_tpu.models.layers import BasicEncoder
from pcfa_tpu.models.raft import (
    BasicMotionEncoder,
    _remat_body,
    FlowHead,
    SepConvGRU,
    upsample_flow_convex,
)
from pcfa_tpu.ops.correlation import (
    corr_lookup_fused,
    corr_lookup_hybrid,
    corr_lookup_window,
    corr_pyramid_pooled,
    f2_feature_pyramid,
    resolve_corr_impl,
)
from pcfa_tpu.ops.warp import coords_grid


class RelPosEmb(nn.Module):
    """Decomposed 2-axis relative positional scores (`gma.py:6-31`).

    Learned embedding tables over relative offsets in height and width; the
    score of (query at (x,y), key at (u,v)) is ⟨q, emb_h[x-u]⟩ + ⟨q,
    emb_w[y-v]⟩. Dead weights under the shipped config but required for the
    `position_only` / `position_and_content` attention variants."""

    max_pos_size: int = 160
    dim_head: int = 128

    @nn.compact
    def __call__(self, q: jnp.ndarray) -> jnp.ndarray:
        # q: (B, heads, H, W, d) (already scaled)
        B, heads, H, W, d = q.shape
        n = 2 * self.max_pos_size - 1
        rel_height = self.param(
            "rel_height", nn.initializers.normal(1.0), (n, d))
        rel_width = self.param(
            "rel_width", nn.initializers.normal(1.0), (n, d))

        def rel_ind(size):
            deltas = jnp.arange(size)[None, :] - jnp.arange(size)[:, None]
            return deltas + self.max_pos_size - 1

        h_emb = rel_height[rel_ind(H)]  # (H, U, d)
        w_emb = rel_width[rel_ind(W)]   # (W, V, d)
        h_score = jnp.einsum("bhxyd,xud->bhxyu", q, h_emb,
                             precision=jax.lax.Precision.HIGHEST)
        w_score = jnp.einsum("bhxyd,yvd->bhxyv", q, w_emb,
                             precision=jax.lax.Precision.HIGHEST)
        # broadcast-add over the (u, v) key grid (`gma.py:28-31`)
        return h_score[..., :, None] + w_score[..., None, :]


class Attention(nn.Module):
    """Global attention over feature positions (`gma.py:34-76`).

    Shipped config: content-only. `position_only` / `position_and_content`
    add the RelPosEmb scores (`gma.py:62-68`)."""

    heads: int = 1
    dim_head: int = 128
    max_pos_size: int = 160
    position_only: bool = False
    position_and_content: bool = False
    #: spatial sharding: keep only this device's query rows — the (HW, HW)
    #: attention matrix (the O(N²) memory object, `gma.py:66-74`) is then
    #: row-sharded exactly like the correlation volume (parallel/sp.py)
    spatial_axis: str | None = None
    spatial_shards: int = 1

    @nn.compact
    def __call__(self, fmap: jnp.ndarray) -> jnp.ndarray:
        B, H, W, _ = fmap.shape
        inner = self.heads * self.dim_head
        qk = nn.Conv(2 * inner, (1, 1), use_bias=False, name="to_qk")(fmap)
        q, k = jnp.split(qk, 2, axis=-1)
        if self.spatial_axis is not None:
            if self.position_only or self.position_and_content:
                raise NotImplementedError(
                    "spatial sharding of the positional-attention variants "
                    "is not implemented (dead weights in the shipped config)"
                )
            hs = H // self.spatial_shards
            r0 = jax.lax.axis_index(self.spatial_axis) * hs
            q = jax.lax.dynamic_slice_in_dim(q, r0, hs, axis=1)
            H = hs
        q = q.reshape(B, H * W, self.heads, self.dim_head) * self.dim_head**-0.5
        k = k.reshape(B, k.shape[1] * W, self.heads, self.dim_head)

        if self.position_only or self.position_and_content:
            q_grid = q.reshape(B, H, W, self.heads, self.dim_head)
            q_grid = q_grid.transpose(0, 3, 1, 2, 4)  # (B, h, H, W, d)
            sim_pos = RelPosEmb(self.max_pos_size, self.dim_head,
                                name="pos_emb")(q_grid)
            sim_pos = sim_pos.reshape(B, self.heads, H * W, H * W)

        if self.position_only:
            sim = sim_pos
        else:
            sim = jnp.einsum(
                "bnhd,bmhd->bhnm", q, k, precision=jax.lax.Precision.HIGHEST
            )
            if self.position_and_content:
                sim = sim + sim_pos
        return jax.nn.softmax(sim, axis=-1)  # (B, heads, HW, HW)


class Aggregate(nn.Module):
    """Attention-weighted aggregation with residual gain γ (`gma.py:79-115`)."""

    heads: int = 1
    dim_head: int = 128
    dim: int = 128
    spatial_axis: str | None = None
    spatial_shards: int = 1

    @nn.compact
    def __call__(self, attn: jnp.ndarray, fmap: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = fmap.shape
        inner = self.heads * self.dim_head
        v = nn.Conv(inner, (1, 1), use_bias=False, name="to_v")(fmap)
        v = v.reshape(B, H * W, self.heads, self.dim_head)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn, v, precision=jax.lax.Precision.HIGHEST
        )
        if self.spatial_axis is not None:
            # attn carried only this device's query rows; reassemble
            out = out.reshape(B, H // self.spatial_shards, W, inner)
            out = jax.lax.all_gather(out, self.spatial_axis, axis=1,
                                     tiled=True)
        out = out.reshape(B, H, W, inner)
        if self.dim != inner:
            out = nn.Conv(self.dim, (1, 1), use_bias=False, name="project")(out)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return fmap + gamma * out


class GMAScanBody(nn.Module):
    """One GMA refinement iteration as a `nn.scan` body (`update.py:112-139`
    + the iteration wrapper `network.py:107-116`). Submodule names match the
    checkpoint layout."""

    hidden_dim: int = 128
    corr_radius: int = 4
    heads: int = 1
    spatial_axis: str | None = None
    spatial_shards: int = 1
    #: see RAFTScanBody — 'fused' rebuilds corr rows blockwise per lookup
    corr_impl: str = "materialized"
    corr_block: int = 1024

    def setup(self):
        from pcfa_tpu.models.layers import tconv

        # attribute names = checkpoint submodule names (update.py:112-139)
        self.encoder = BasicMotionEncoder()
        self.aggregator = Aggregate(
            heads=self.heads, dim_head=128, dim=128,
            spatial_axis=self.spatial_axis,
            spatial_shards=self.spatial_shards)
        self.gru = SepConvGRU(self.hidden_dim)
        self.flow_head = FlowHead(256)
        self.mask_conv1 = tconv(256, (3, 3))
        self.mask_conv2 = tconv(64 * 9, (1, 1))

    def mask(self, net):
        """Upsampling-mask head, hoisted out of the scan — only the final
        iteration's mask is consumed and it depends only on the final GRU
        state (see RAFTScanBody.mask)."""
        m = nn.relu(self.mask_conv1(net))
        return 0.25 * self.mask_conv2(m)

    def __call__(self, carry, const):
        net, coords1 = carry
        if self.corr_impl in ("fused", "hybrid"):
            inp, coords0, attention, fmap1, pyramid = const
        else:
            inp, coords0, attention, pyramid = const
        coords1 = jax.lax.stop_gradient(coords1)  # network.py:108
        if self.corr_impl == "hybrid":
            # (fmap2, materialized levels 1..L-1); level 0 rebuilt per lookup
            fmap2, rest = pyramid[0], list(pyramid[1:])
            corr = corr_lookup_hybrid(fmap1, fmap2, rest, coords1,
                                      self.corr_radius, self.corr_block)
        elif self.spatial_axis is not None:
            hs = coords1.shape[1] // self.spatial_shards
            r0 = jax.lax.axis_index(self.spatial_axis) * hs
            c_loc = jax.lax.dynamic_slice_in_dim(coords1, r0, hs, axis=1)
            if self.corr_impl == "fused":
                f1_loc = jax.lax.dynamic_slice_in_dim(fmap1, r0, hs, axis=1)
                corr_loc = corr_lookup_fused(
                    f1_loc, list(pyramid), c_loc, self.corr_radius,
                    self.corr_block)
            else:
                corr_loc = corr_lookup_window(list(pyramid), c_loc,
                                          self.corr_radius)
            corr = jax.lax.all_gather(corr_loc, self.spatial_axis,
                                      axis=1, tiled=True)
        elif self.corr_impl == "fused":
            corr = corr_lookup_fused(fmap1, list(pyramid), coords1,
                                     self.corr_radius, self.corr_block)
        else:
            corr = corr_lookup_window(list(pyramid), coords1, self.corr_radius)
        flow = coords1 - coords0
        # keep bf16 compute dtypes from being promoted by the fp32 coords
        corr, flow = corr.astype(net.dtype), flow.astype(net.dtype)
        motion = self.encoder(flow, corr)
        motion_global = self.aggregator(attention, motion)
        gru_in = jnp.concatenate([inp, motion, motion_global], axis=-1)
        net = self.gru(net, gru_in)
        delta_flow = self.flow_head(net)
        return (net, coords1 + delta_flow), None


class GMA(nn.Module):
    """RAFT-GMA (`network.py:26-129`), unit-range inputs, NHWC.

    Returns (flow_lowres, flow_up) like `test_mode=True`."""

    iters: int = 6
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    num_heads: int = 1
    position_only: bool = False           # gma_config.json: false
    position_and_content: bool = False    # gma_config.json: false
    remat: bool = False
    remat_policy: str | None = None  # see models/raft._remat_body
    #: spatial sharding (parallel/sp.py): row-shards BOTH O(N²) objects —
    #: the correlation volume and the global attention matrix
    spatial_axis: str | None = None
    spatial_shards: int = 1
    #: 'fused' = blockwise volume-free correlation (see models/raft.py);
    #: 'auto' (default) picks per static shape via `resolve_corr_impl`
    corr_impl: str = "auto"
    corr_block: int = 1024

    @nn.compact
    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray):
        x1 = 2.0 * image1 - 1.0
        x2 = 2.0 * image2 - 1.0

        fnet = BasicEncoder(output_dim=256, norm_fn="instance", name="fnet")
        fmaps = fnet(jnp.concatenate([x1, x2], axis=0))
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)

        corr_impl = resolve_corr_impl(
            self.corr_impl, fmap1.shape, fmap2.shape, self.corr_levels,
            fmap1.dtype, self.spatial_shards,
        )
        if corr_impl == "hybrid" and self.spatial_axis is not None:
            raise NotImplementedError(
                "corr_impl='hybrid' is not supported under spatial "
                "sharding (use 'materialized' or 'fused')")
        if corr_impl == "fused":
            pyramid = f2_feature_pyramid(fmap2, self.corr_levels)
        elif corr_impl == "hybrid":
            pyramid = [fmap2] + corr_pyramid_pooled(
                fmap1, fmap2, self.corr_levels, start_level=1)
        elif self.spatial_axis is not None:
            hs = fmap1.shape[1] // self.spatial_shards
            r0 = jax.lax.axis_index(self.spatial_axis) * hs
            f1_loc = jax.lax.dynamic_slice_in_dim(fmap1, r0, hs, axis=1)
            # per-level pooled-f2 construction (NOT volume pooling): kills
            # the one-time dpyramid→dvolume unpool backward chain
            pyramid = corr_pyramid_pooled(f1_loc, fmap2, self.corr_levels)
        else:
            pyramid = corr_pyramid_pooled(fmap1, fmap2, self.corr_levels)

        cnet = BasicEncoder(output_dim=self.hidden_dim + self.context_dim,
                            norm_fn="batch", name="cnet")(x1)
        net, inp = jnp.split(cnet, [self.hidden_dim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        attention = Attention(
            heads=self.num_heads, dim_head=self.context_dim,
            position_only=self.position_only,
            position_and_content=self.position_and_content,
            spatial_axis=self.spatial_axis,
            spatial_shards=self.spatial_shards, name="att"
        )(inp)

        B, H8, W8, _ = net.shape
        coords0 = coords_grid(B, H8, W8)
        # + 0·net: inherit data-varying-ness so the scan carry type is
        # consistent under shard_map (vma) — a no-op otherwise
        coords1 = coords_grid(B, H8, W8) + 0.0 * net[..., :2]
        if self.spatial_axis is not None:
            # per-iteration all_gathers make the carries device-varying;
            # seed that variance into the initial carry (vma consistency)
            if corr_impl != "fused":
                seed = 0.0 * pyramid[0].reshape(-1)[0].astype(net.dtype)
            else:
                seed = 0.0 * jax.lax.axis_index(self.spatial_axis).astype(
                    net.dtype)
            net = net + seed
            coords1 = coords1 + seed

        body = _remat_body(GMAScanBody, self.remat, self.remat_policy)
        scanned = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            length=self.iters,
            methods=["__call__"],  # .mask() stays unscanned
        )(self.hidden_dim, self.corr_radius, self.num_heads,
          spatial_axis=self.spatial_axis, spatial_shards=self.spatial_shards,
          corr_impl=corr_impl, corr_block=self.corr_block,
          name="update_block")

        const = ((inp, coords0, attention, fmap1, tuple(pyramid))
                 if corr_impl in ("fused", "hybrid")
                 else (inp, coords0, attention, tuple(pyramid)))
        (net, coords1), _ = scanned((net, coords1), const)
        up_mask = scanned.mask(net)

        flow_lr = coords1 - coords0
        flow_up = upsample_flow_convex(flow_lr, up_mask)
        return flow_lr, flow_up
