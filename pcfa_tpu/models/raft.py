"""RAFT in Flax/JAX — recurrent all-pairs field transforms (north-star model).

TPU-first rebuild of the behavior of `models/raft/{raft,extractor,update,
corr}.py`: NHWC layout, the all-pairs correlation volume as one XLA matmul
(MXU), the iterative GRU refinement as a `lax.scan` with optional
rematerialization (`jax.checkpoint`) so L-BFGS can differentiate through all
iterations without exhausting HBM.

Faithful semantics:
* inputs normalized to [-1,1] (`raft.py:89-90`; we take unit [0,1] input per
  the zoo contract, so the transform is `2x-1`)
* fnet = BasicEncoder(256, instance-norm), cnet = BasicEncoder(256, batch
  norm) split 128/128 into tanh(net)/relu(inp) (`raft.py:54-56,110-114`)
* 4-level correlation pyramid of ⟨f1,f2⟩/√256 with radius-4 bilinear window
  lookup, including the reference's transposed (dy↔dx) window-offset quirk
  (`corr.py:12-60`, see `ops/correlation.py`)
* `coords1` detached at every iteration (`raft.py:123`) → `stop_gradient`,
  which matters for attack-gradient parity
* convex-combination 8× upsampling with 0.25-scaled mask logits
  (`raft.py:72-83`, `update.py:135`)
* `test_mode` pair (flow_lowres, flow_up) returned as a tuple
  (`raft.py:141-142`)
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcfa_tpu.models.layers import BasicEncoder, tconv
from pcfa_tpu.ops.correlation import (
    corr_lookup_fused,
    corr_lookup_hybrid,
    corr_lookup_window,
    corr_pyramid_pooled,
    f2_feature_pyramid,
    resolve_corr_impl,
)
from pcfa_tpu.ops.warp import coords_grid


def _remat_body(body_cls, remat: bool, policy_name: str | None):
    """Wrap a scan-body module class per the remat config. 'dots' keeps
    matmul/conv outputs resident and recomputes only elementwise ops —
    cheaper backward than full remat at a modest activation-memory cost."""
    if not remat:
        return body_cls
    if policy_name == "dots":
        return nn.remat(
            body_cls,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    if policy_name is not None:
        raise ValueError(f"unknown remat_policy {policy_name!r}")
    return nn.remat(body_cls)


class FlowHead(nn.Module):
    """`update.py:6-14`."""

    hidden_dim: int = 256

    @nn.compact
    def __call__(self, x):
        x = nn.relu(tconv(self.hidden_dim, (3, 3), name="conv1")(x))
        return tconv(2, (3, 3), name="conv2")(x)


def _gru_fused_default() -> bool:
    # PCFA_GRU_FUSED=1: compute the z/r gates (which share the same hx
    # input) as ONE conv with output-concatenated kernels. Same math, same
    # param tree (the kernel concat is loop-invariant, so XLA hoists it out
    # of the refinement scan); halves the GRU's gate-conv dispatches.
    import os

    return os.environ.get("PCFA_GRU_FUSED", "0") == "1"


class _ConvParams(nn.Module):
    """Param-tree twin of `tconv(features, ksize)` that only DECLARES the
    kernel/bias (the fused GRU concatenates gate kernels before one conv)."""

    features: int
    ksize: tuple[int, int]

    @nn.compact
    def __call__(self, c_in: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (*self.ksize, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class SepConvGRU(nn.Module):
    """`update.py:33-60`: horizontal (1×5) then vertical (5×1) GRU passes.

    `fused` (default via PCFA_GRU_FUSED): z and r read the same hx, so
    their convs run as one double-width conv + channel split — identical
    math and params, fewer passes."""

    hidden_dim: int = 128
    fused: bool | None = None

    @nn.compact
    def __call__(self, h, x):
        fused = self.fused if self.fused is not None else _gru_fused_default()
        for suffix, ksize in (("1", (1, 5)), ("2", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            if fused:
                kz, bz = _ConvParams(self.hidden_dim, ksize,
                                     name=f"convz{suffix}")(hx.shape[-1])
                kr, br = _ConvParams(self.hidden_dim, ksize,
                                     name=f"convr{suffix}")(hx.shape[-1])
                pad = [(k // 2, k // 2) for k in ksize]
                # match nn.Conv's dtype promotion (input vs param dtype)
                dt = jnp.promote_types(hx.dtype, kz.dtype)
                zr = jax.lax.conv_general_dilated(
                    hx.astype(dt),
                    jnp.concatenate([kz, kr], axis=-1).astype(dt),
                    window_strides=(1, 1), padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + jnp.concatenate([bz, br]).astype(dt)
                z = nn.sigmoid(zr[..., :self.hidden_dim])
                r = nn.sigmoid(zr[..., self.hidden_dim:])
            else:
                z = nn.sigmoid(
                    tconv(self.hidden_dim, ksize, name=f"convz{suffix}")(hx))
                r = nn.sigmoid(
                    tconv(self.hidden_dim, ksize, name=f"convr{suffix}")(hx))
            rhx = jnp.concatenate([r * h, x], axis=-1)
            q = nn.tanh(tconv(self.hidden_dim, ksize, name=f"convq{suffix}")(rhx))
            h = (1 - z) * h + z * q
        return h


class BasicMotionEncoder(nn.Module):
    """`update.py:79-97`."""

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(tconv(256, (1, 1), name="convc1")(corr))
        cor = nn.relu(tconv(192, (3, 3), name="convc2")(cor))
        flo = nn.relu(tconv(128, (7, 7), name="convf1")(flow))
        flo = nn.relu(tconv(64, (3, 3), name="convf2")(flo))
        out = nn.relu(
            tconv(126, (3, 3), name="conv")(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, flow], axis=-1)


class BasicUpdateBlock(nn.Module):
    """`update.py:114-136`: motion encoder → SepConvGRU → flow head + mask."""

    hidden_dim: int = 128

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(name="encoder")(flow, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, name="gru")(net, gru_in)
        delta_flow = FlowHead(256, name="flow_head")(net)
        m = nn.relu(tconv(256, (3, 3), name="mask_conv1")(net))
        mask = 0.25 * tconv(64 * 9, (1, 1), name="mask_conv2")(m)
        return net, mask, delta_flow


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray, factor: int = 8):
    """Convex-combination upsampling (`raft.py:72-83`), NHWC.

    flow: (B, H, W, 2); mask: (B, H, W, 9·factor²) with torch channel order
    c = (k·factor + i)·factor + j (k = 3×3 neighbor row-major, i,j subpixel).
    """
    B, H, W, _ = flow.shape
    f = factor
    mask = mask.reshape(B, H, W, 9, f, f)
    mask = jax.nn.softmax(mask, axis=3)

    fp = jnp.pad(factor * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neighbors = jnp.stack(
        [
            jax.lax.dynamic_slice(fp, (0, dy, dx, 0), (B, H, W, 2))
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # (B, H, W, 9, 2) — k row-major like F.unfold

    # convex combination as a broadcast multiply-reduce, NOT an einsum: as a
    # batched matmul this contracts k=9 with outputs (i·j=64)×(c=2) — both
    # get padded to 128 lanes on the MXU (measured 10.2 ms of the closure in
    # profile_base2). The elementwise form runs on the VPU, fuses into the
    # softmax, and keeps fp32 flow math bit-comparable. Compute in the wider
    # of the two dtypes so a bf16 mask never downcasts fp32 flow (and vice
    # versa) — the flow carry is fp32 by contract, the mask may be bf16.
    out_dtype = jnp.promote_types(mask.dtype, neighbors.dtype)
    up = jnp.sum(
        mask[..., None].astype(out_dtype)
        * neighbors[:, :, :, :, None, None, :].astype(out_dtype),
        axis=3,
    )
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (B, H, i, W, j, C)
    return up.reshape(B, f * H, f * W, 2)


class RAFTScanBody(nn.Module):
    """One refinement iteration as a `nn.scan` body.

    Submodule names match `BasicUpdateBlock` exactly, so the converted
    checkpoint tree is unchanged. Scanning (instead of unrolling) keeps the
    HLO 12× smaller — the update weights are loop-invariant, which is
    exactly what `lax.scan` expresses to XLA."""

    hidden_dim: int = 128
    corr_radius: int = 4
    #: spatial (context-parallel analog) sharding: when set, `pyramid` holds
    #: only this device's row shard of the correlation volume; the lookup
    #: runs on the local coordinate rows and the (tiny) corr features are
    #: re-assembled with one tiled all_gather over the named mesh axis
    spatial_axis: str | None = None
    spatial_shards: int = 1
    #: 'materialized' — pyramid holds corr maps (volume built once);
    #: 'fused' — pyramid holds pooled f2 FEATURE maps + const carries fmap1,
    #: and the volume rows are rebuilt blockwise per lookup (alt_cuda_corr
    #: analog, never materializing O(N²); `ops/correlation.py`)
    corr_impl: str = "materialized"
    corr_block: int = 1024

    def setup(self):
        # attribute names = checkpoint submodule names (update.py:114-136)
        self.encoder = BasicMotionEncoder()
        self.gru = SepConvGRU(self.hidden_dim)
        self.flow_head = FlowHead(256)
        self.mask_conv1 = tconv(256, (3, 3))
        self.mask_conv2 = tconv(64 * 9, (1, 1))

    def mask(self, net):
        """Upsampling-mask head. Only the FINAL iteration's mask feeds the
        convex upsampler (`raft.py:141-142` returns the last flow_up), and
        it is a pure function of the final GRU state — so the caller runs
        this ONCE after the scan instead of 12× inside it (same math,
        `masks[-1] == mask(net_final)`; saves 11 mask-head fwd+bwd passes
        per closure)."""
        m = nn.relu(self.mask_conv1(net))
        return 0.25 * self.mask_conv2(m)

    def __call__(self, carry, const):
        net, coords1 = carry
        if self.corr_impl in ("fused", "hybrid"):
            inp, coords0, fmap1, pyramid = const
        else:
            inp, coords0, pyramid = const
        coords1 = jax.lax.stop_gradient(coords1)  # raft.py:123
        if self.corr_impl == "hybrid":
            # pyramid = (fmap2, materialized levels 1..L−1): level 0 is
            # rebuilt blockwise from the feature maps per lookup
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
        # coords stay fp32 (pixel positions); under a bf16 compute dtype the
        # network features must not be silently promoted back to fp32
        corr, flow = corr.astype(net.dtype), flow.astype(net.dtype)
        motion = self.encoder(flow, corr)
        gru_in = jnp.concatenate([inp, motion], axis=-1)
        net = self.gru(net, gru_in)
        delta_flow = self.flow_head(net)
        return (net, coords1 + delta_flow), None


class RAFT(nn.Module):
    """Full-size RAFT (`raft_config.json`: small=false). Unit-range inputs.

    Returns (flow_lowres, flow_up) like `test_mode=True` (`raft.py:141-142`).
    The 12-iteration refinement is a `lax.scan` (via `nn.scan`) with
    rematerialized bodies so L-BFGS can differentiate through all
    iterations at bounded memory.
    """

    iters: int = 12
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128
    #: remat the per-iteration update to bound autodiff memory; off by
    #: default — measured 14% faster fwd+bwd on v5e at KITTI size and the
    #: activations fit HBM comfortably at attack batch sizes
    remat: bool = False
    #: remat policy: None = full recompute; 'dots' saves matmul/conv
    #: outputs and recomputes only cheap elementwise ops in the backward
    #: (jax.checkpoint_policies.dots_with_no_batch_dims_saveable) — a
    #: middle ground between full remat and no remat for batched pairs
    remat_policy: str | None = None
    #: spatial sharding (SURVEY.md §2.6 CP analog): run under `shard_map`
    #: over a mesh axis of this name with `spatial_shards` devices. The
    #: O(N²) correlation volume — the memory-scaling pressure for large
    #: frames — is built and looked up per row shard; encoders/GRU stay
    #: replicated. See `parallel/sp.py`.
    spatial_axis: str | None = None
    spatial_shards: int = 1
    #: 'fused' = blockwise volume-free correlation (see RAFTScanBody); the
    #: memory lever for ≥2× KITTI-resolution frames or larger per-chip batch.
    #: 'auto' (default) picks per static shape: materialized while the
    #: pyramid fits the HBM budget, fused beyond (`resolve_corr_impl`)
    corr_impl: str = "auto"
    corr_block: int = 1024

    @nn.compact
    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray):
        x1 = 2.0 * image1 - 1.0
        x2 = 2.0 * image2 - 1.0

        fnet = BasicEncoder(output_dim=256, norm_fn="instance", name="fnet")
        # batched like the reference's fnet([image1, image2]) — one pass
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
            # pooled FEATURE maps; corr rows rebuilt blockwise per lookup
            pyramid = f2_feature_pyramid(fmap2, self.corr_levels)
        elif corr_impl == "hybrid":
            # raw fmap2 (level 0 rebuilt per lookup) + materialized 1..L−1
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

        B, H8, W8, _ = net.shape
        coords0 = coords_grid(B, H8, W8)
        # + 0·net: inherit data-varying-ness so the scan carry type is
        # consistent under shard_map (vma) — a no-op otherwise
        coords1 = coords_grid(B, H8, W8) + 0.0 * net[..., :2]
        if self.spatial_axis is not None:
            # the per-iteration all_gather makes the carries device-varying;
            # seed that variance into the initial carry (vma consistency)
            if corr_impl != "fused":
                seed = 0.0 * pyramid[0].reshape(-1)[0].astype(net.dtype)
            else:
                seed = 0.0 * jax.lax.axis_index(self.spatial_axis).astype(
                    net.dtype)
            net = net + seed
            coords1 = coords1 + seed

        body = _remat_body(RAFTScanBody, self.remat, self.remat_policy)
        scanned = nn.scan(
            body,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            length=self.iters,
            methods=["__call__"],  # .mask() stays unscanned (see its doc)
        )(self.hidden_dim, self.corr_radius,
          spatial_axis=self.spatial_axis, spatial_shards=self.spatial_shards,
          corr_impl=corr_impl, corr_block=self.corr_block,
          name="update_block")

        const = ((inp, coords0, fmap1, tuple(pyramid))
                 if corr_impl in ("fused", "hybrid")
                 else (inp, coords0, tuple(pyramid)))
        (net, coords1), _ = scanned((net, coords1), const)
        up_mask = scanned.mask(net)

        flow_lr = coords1 - coords0
        flow_up = upsample_flow_convex(flow_lr, up_mask)
        return flow_lr, flow_up
