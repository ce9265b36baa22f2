"""PWC-DC Net in Flax — pyramid / warping / cost-volume network.

Rebuild of the behavior of `models/PWCNet/PWCNet.py` (Sun et al. 2018,
PWC-DC variant): 6-level shared conv pyramid, coarse-to-fine decoding with
backward-warped features, patch-9 local correlation (the reference's
CUDA/OpenMP `spatial_correlation_sampler` → our `ops.local_correlation`,
XLA/Pallas), DenseNet-style flow decoders, dilated context network.

Faithful quirks:
* RGB→BGR channel flip on entry (`PWCNet.py:232-233`); `normalize` exists
  but is never called in forward (`PWCNet.py:214-225`) — inputs are [0,1].
* warp grid normalized in the align_corners=True convention but sampled with
  grid_sample's default align_corners=False, zeros padding; validity mask
  from warping an all-ones tensor, thresholded at 1e-4 (`PWCNet.py:166-206`)
  — the threshold makes the mask piecewise-constant (no gradient), matching
  torch.
* per-level flow scaling ×0.625/1.25/2.5/5.0 (`PWCNet.py:263,277,291,307`),
  final `20 × bilinear-upsample×4` (`PWCNet.py:321-325`, align_corners=False)
  — output resolution is the padded input resolution.
* correlation output passes LeakyReLU(0.1) (`PWCNet.py:250`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcfa_tpu.ops.correlation import local_correlation
from pcfa_tpu.ops.warp import grid_sample, interpolate_bilinear


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


def _conv_pallas_default() -> bool:
    return jax.default_backend() == "tpu"


class _PConv3(nn.Module):
    """Param-tree twin of `nn.Conv` running the shifted-slab Pallas kernel
    (`ops/pallas/small_conv.py`) with a fused LeakyReLU epilogue — for the
    feature pyramid's small-channel 3×3 convs that XLA pads to 128 lanes."""

    features: int
    stride: int

    @nn.compact
    def __call__(self, x):  # x NHWC
        c_in = x.shape[-1]
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from pcfa_tpu.ops.pallas.small_conv import small_conv2d

        out = small_conv2d(x.transpose(0, 1, 3, 2).astype(kern.dtype),
                           kern, bias, "leaky", self.stride)
        return out.transpose(0, 1, 3, 2)


class ConvLeaky(nn.Module):
    """`conv()` helper (`PWCNet.py:33-37`): Conv2d + LeakyReLU(0.1)."""

    features: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        if (self.dilation == 1 and x.shape[-1] <= 64
                and self.stride in (1, 2)
                and x.shape[1] % self.stride == 0
                and x.shape[2] % self.stride == 0
                and _conv_pallas_default()):
            return _PConv3(self.features, self.stride, name="0")(x)
        d = self.dilation
        pad = [(d, d), (d, d)]  # reference always uses padding == dilation
        return _leaky(
            nn.Conv(self.features, (3, 3), strides=self.stride,
                    kernel_dilation=d, padding=pad, name="0")(x)
        )


def predict_flow(name: str):
    """`predict_flow()` (`PWCNet.py:39-40`)."""
    return nn.Conv(2, (3, 3), padding=[(1, 1), (1, 1)], name=name)


def deconv(features: int, name: str):
    """`deconv()` (`PWCNet.py:42-43`): ConvTranspose2d(k=4, s=2, p=1).

    Flax equivalence (verified vs torch): flipped HWIO kernel + SAME pad —
    the converter's `conv_transpose_kernel` performs the flip."""
    return nn.ConvTranspose(features, (4, 4), strides=(2, 2), padding="SAME",
                            name=name)


def pwc_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward warp with validity mask (`PWCNet.py:166-206`), NHWC."""
    B, H, W, C = x.shape
    xs = jnp.arange(W, dtype=x.dtype)
    ys = jnp.arange(H, dtype=x.dtype)
    base = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)
    vgrid = base[None] + flow
    gx = 2.0 * vgrid[..., 0] / max(W - 1, 1) - 1.0
    gy = 2.0 * vgrid[..., 1] / max(H - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    out = grid_sample(x, grid, align_corners=False, padding_mode="zeros")
    ones = jnp.ones_like(x)
    mask = grid_sample(ones, grid, align_corners=False, padding_mode="zeros")
    mask = (mask >= 0.0001).astype(x.dtype)
    return out * mask


class PWCDCNet(nn.Module):
    """`PWCDCNet` (`PWCNet.py:60-330`), eval-mode output (flow2 only)."""

    md: int = 4  # max displacement → patch 9
    #: None → use the fused Pallas correlation kernel on TPU backends
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, im1: jnp.ndarray, im2: jnp.ndarray) -> jnp.ndarray:
        # RGB → BGR (`PWCNet.py:232-233`)
        im1 = im1[..., ::-1]
        im2 = im2[..., ::-1]

        # --- shared feature pyramid (`PWCNet.py:74-91,235-246`) -------------
        enc = [
            ("1", 16), ("2", 32), ("3", 64), ("4", 96), ("5", 128), ("6", 196),
        ]
        stages = {}
        for lvl, ch in enc:
            # level 6 orders its stride-2 conv as conv6aa (`PWCNet.py:89-91`)
            names = (
                (f"conv{lvl}aa", f"conv{lvl}a", f"conv{lvl}b")
                if lvl == "6"
                else (f"conv{lvl}a", f"conv{lvl}aa", f"conv{lvl}b")
            )
            stages[lvl] = (
                ConvLeaky(ch, stride=2, name=names[0]),
                ConvLeaky(ch, stride=1, name=names[1]),
                ConvLeaky(ch, stride=1, name=names[2]),
            )

        feats = {}
        for img_idx, x in ((1, im1), (2, im2)):
            for lvl, _ in enc:
                for m in stages[lvl]:
                    x = m(x)
                feats[(img_idx, lvl)] = x

        patch = 2 * self.md + 1
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"

        def correlate(a, b):
            # bf16-only: at fp32 the kernel's ≤16 MB output gets placed in
            # scoped VMEM and double-buffered past the chipless-AOT limit
            # (measured: f32[1,96,320,81] → "Scoped allocation 16.66M
            # exceeded limit"; same failure class as the small_conv fp32
            # strided transpose, ops/pallas/small_conv.py)
            if use_pallas and a.dtype == jnp.bfloat16:
                from pcfa_tpu.ops.pallas import local_correlation_pallas

                return _leaky(local_correlation_pallas(a, b, patch))
            return _leaky(local_correlation(a, b, patch_size=patch))

        def dense_decoder(x, lvl: str):
            """DenseNet decoder (`PWCNet.py:101-106` etc.)."""
            for i, ch in enumerate((128, 128, 96, 64, 32)):
                y = ConvLeaky(ch, name=f"conv{lvl}_{i}")(x)
                x = jnp.concatenate([y, x], axis=-1)
            flow = predict_flow(f"predict_flow{lvl}")(x)
            return x, flow

        # --- level 6 ---------------------------------------------------------
        corr6 = correlate(feats[(1, "6")], feats[(2, "6")])
        x, flow6 = dense_decoder(corr6, "6")
        up_flow = deconv(2, "deconv6")(flow6)
        up_feat = deconv(2, "upfeat6")(x)

        flows = {"6": flow6}
        scales = {"5": 0.625, "4": 1.25, "3": 2.5, "2": 5.0}
        for lvl in ("5", "4", "3", "2"):
            c1 = feats[(1, lvl)]
            c2 = feats[(2, lvl)]
            warped = pwc_warp(c2, up_flow * scales[lvl])
            corr = correlate(c1, warped)
            x = jnp.concatenate([corr, c1, up_flow, up_feat], axis=-1)
            x, flow = dense_decoder(x, lvl)
            flows[lvl] = flow
            if lvl != "2":
                up_flow = deconv(2, f"deconv{lvl}")(flow)
                up_feat = deconv(2, f"upfeat{lvl}")(x)

        # --- context network (`PWCNet.py:149-155,318-319`) -------------------
        y = x
        for i, (ch, dil) in enumerate(
            ((128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)), 1
        ):
            y = ConvLeaky(ch, dilation=dil, name=f"dc_conv{i}")(y)
        flow2 = flows["2"] + predict_flow("dc_conv7")(y)

        # --- output scaling (`PWCNet.py:321-330`, eval branch) --------------
        H4, W4 = flow2.shape[1:3]
        return 20.0 * interpolate_bilinear(
            flow2, (4 * H4, 4 * W4), align_corners=False
        )
