"""SpyNet in Flax — 6-level spatial-pyramid flow estimator.

TPU-first re-design of the behavior of `models/SpyNet/SpyNet.py` (reference):
channels-last NHWC, static shapes, one traced coarse-to-fine Python loop that
XLA fuses per level. Semantics replicated exactly:

* ImageNet normalization `(x - mean) / std` (`SpyNet.py:46-52`; the attack
  path always constructs the net with `pre_normalization=None`,
  `ownutilities.py:144`).
* Image pyramid via repeated 2×2 average pooling (`SpyNet.py:136-141`).
* Initial flow: zeros at *half* the coarsest resolution (`SpyNet.py:144`),
  then per level: bilinear 2× upsample (align_corners=False) × 2.0
  (`SpyNet.py:147`), backward-warp frame 2 (grid built in the
  align_corners=True convention, clamped to [-1,1], sampled with
  grid_sample's default align_corners=False — `SpyNet.py:90-102`), and a
  5-conv `Basic` residual block (8→32→64→32→16→2, k=7, `SpyNet.py:61-71`).

Input contract (see `models/spec.py`): img1, img2 in [0,1], H,W divisible by
64 (adapter contract `ownutilities.py:261-266`; divisibility by 64 also means
the odd-size replicate-pad branch `SpyNet.py:149-150` can never trigger).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcfa_tpu.ops.warp import avg_pool2d, grid_sample, interpolate_bilinear

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _preprocess(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def spynet_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp with SpyNet's exact grid convention (`SpyNet.py:90-102`):
    base grid linspace(-1,1) (align_corners=True spacing), flow normalized by
    (size-1)/2, clamped to [-1,1], then bilinear-sampled with
    align_corners=False and zero padding."""
    B, H, W, _ = img.shape
    xs = jnp.linspace(-1.0, 1.0, W, dtype=img.dtype)
    ys = jnp.linspace(-1.0, 1.0, H, dtype=img.dtype)
    base = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (H, W, 2)
    norm = jnp.asarray([(W - 1.0) / 2.0, (H - 1.0) / 2.0], img.dtype)
    grid = base[None] + flow / norm
    grid = jnp.clip(grid, -1.0, 1.0)
    return grid_sample(img, grid, align_corners=False, padding_mode="zeros")


class Conv7(nn.Module):
    """One SpyNet 7×7 SAME conv with optional fused ReLU.

    Param tree identical to `nn.Conv` (kernel HWIO + bias), but on TPU the
    compute runs through the shifted-slab Pallas kernel
    (`ops/pallas/small_conv.py`) on NHCW operands — XLA's NHWC conv pads
    SpyNet's 2–64 channels to 128 lanes and runs at a few percent MXU
    utilization."""

    features: int
    relu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, nhcw: bool = False) -> jnp.ndarray:
        c_in = x.shape[2] if nhcw else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # under a bf16 compute dtype the warp/upsample path re-promotes to
        # fp32 (pixel-coordinate math); convs require matching dtypes
        x = x.astype(kernel.dtype)
        if nhcw:
            from pcfa_tpu.ops.pallas.small_conv import small_conv2d

            return small_conv2d(x, kernel, bias, self.relu)
        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        return nn.relu(out) if self.relu else out


class BasicBlock(nn.Module):
    """SpyNet `Basic` unit: 5 convs k=7 SAME, ReLU between (`SpyNet.py:61-71`).

    `use_pallas=None` → Pallas path iff running on TPU. The Pallas path
    transposes to NHCW once, chains the five fused convs, and transposes
    back — no intermediate layout changes."""

    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        convs = [Conv7(feat, relu=i < 4, name=f"conv{i}")
                 for i, feat in enumerate((32, 64, 32, 16, 2))]
        if use_pallas:
            x = x.transpose(0, 1, 3, 2)          # NHWC → NHCW
            for conv in convs:
                x = conv(x, nhcw=True)
            return x.transpose(0, 1, 3, 2)
        for conv in convs:
            x = conv(x)
        return x


class SpyNet(nn.Module):
    """Coarse-to-fine pyramid network (`SpyNet.py:104-158`, eval mode).

    `moduleBasic[i]` consumes level `nlevels-1-i` of the pyramid (coarsest
    first), matching the reference's list ordering.
    """

    nlevels: int = 6
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
        x1, x2 = _preprocess(img1), _preprocess(img2)
        pyr1, pyr2 = [x1], [x2]
        for _ in range(self.nlevels - 1):
            pyr1.insert(0, avg_pool2d(pyr1[0], 2, 2))
            pyr2.insert(0, avg_pool2d(pyr2[0], 2, 2))

        B, h0, w0, _ = pyr1[0].shape
        flow = jnp.zeros((B, h0 // 2, w0 // 2, 2), img1.dtype)

        for lvl in range(self.nlevels):
            H, W = pyr1[lvl].shape[1:3]
            up = interpolate_bilinear(flow, (H, W), align_corners=False) * 2.0
            warped = spynet_warp(pyr2[lvl], up)
            inp = jnp.concatenate([pyr1[lvl], warped, up], axis=-1)
            flow = BasicBlock(use_pallas=self.use_pallas,
                              name=f"basic{lvl}")(inp) + up
        return flow
