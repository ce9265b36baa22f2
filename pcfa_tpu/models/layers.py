"""Shared NN building blocks for the RAFT-family models (NHWC, eval-mode).

Covers the reference's `models/raft/extractor.py` (ResidualBlock /
BasicEncoder) and its normalization flavors. All models in this zoo are
*frozen* at attack time (`attack_PCFA.py:647-650`), so normalization layers
are implemented in their eval-mode form:

* BatchNorm → `FrozenBatchNorm`: per-channel affine `x·scale + bias` with the
  running statistics folded in at weight-conversion time (zero runtime cost,
  fuses into the preceding conv under XLA).
* InstanceNorm (torch affine=False) → parameter-free per-sample/channel
  normalization over H,W with biased variance, eps=1e-5.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def tconv(features: int, kernel_size: tuple[int, int], strides: int = 1,
          name: str | None = None) -> nn.Conv:
    """`nn.Conv` with torch-style symmetric padding (k//2 per side).

    Flax 'SAME' pads asymmetrically for strided layers (lo=2/hi=3 for k=7,
    s=2) while torch's Conv2d(padding=k//2) is symmetric — the difference
    shifts every strided feature map by a pixel."""
    pad = [(k // 2, k // 2) for k in kernel_size]
    return nn.Conv(features, kernel_size, strides=strides, padding=pad,
                   name=name)


class FrozenBatchNorm(nn.Module):
    """Eval-mode BatchNorm as a learned-constant affine transform."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, nhcw: bool = False) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if nhcw:
            return x * scale[:, None] + bias[:, None]
        return x * scale + bias


def instance_norm(x: jnp.ndarray, eps: float = 1e-5,
                  nhcw: bool = False) -> jnp.ndarray:
    """torch `nn.InstanceNorm2d` (affine=False, eval == train); NHWC or
    NHCW (channel axis 2) layout."""
    axes = (1, 3) if nhcw else (1, 2)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def make_norm(norm_fn: str, features: int, name: str, nhcw: bool = False):
    """Returns a callable applying the requested normalization."""
    if norm_fn == "batch":
        bn = FrozenBatchNorm(features, name=name)
        return (lambda x: bn(x, nhcw=True)) if nhcw else bn
    if norm_fn == "instance":
        return (lambda x: instance_norm(x, nhcw=True)) if nhcw \
            else instance_norm
    if norm_fn == "none":
        return lambda x: x
    raise ValueError(f"unsupported norm_fn: {norm_fn}")


class PConv(nn.Module):
    """3×3 SAME conv on NHCW operands through the shifted-slab Pallas
    kernel (`ops/pallas/small_conv.py`). Param tree identical to `nn.Conv`
    (kernel HWIO + bias), so checkpoints are layout-agnostic.

    Why: XLA pads BOTH channel axes of an NHWC conv to 128 lanes, so the
    encoders' 64-channel layer1 runs at ~25% MXU utilization (the round-2
    base-cost dissection's biggest remaining item, BASELINE.md). The
    kernel's block-Toeplitz plan for C=64/k=3 packs TWO output rows per
    matmul → K = M = 128, full tiles. When the output height doesn't fit
    any tile plan, `small_conv2d` falls back to an XLA conv with identical
    NHCW semantics — shape-safe at every stage."""

    features: int
    ksize: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[2]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.ksize, self.ksize, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from pcfa_tpu.ops.pallas.small_conv import small_conv2d

        return small_conv2d(x.astype(kernel.dtype), kernel, bias, None,
                            self.stride)


class Conv1x1(nn.Module):
    """1×1 conv on NHCW operands (strided slice + one einsum; param tree
    identical to `nn.Conv` with a (1, 1, C_in, F) kernel + bias). torch's
    Conv2d(k=1, stride=s, padding=0) samples x[s·i, s·j] exactly."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c_in = x.shape[2]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.stride != 1:
            x = x[:, ::self.stride, :, ::self.stride]
        out = jnp.einsum("bhcw,co->bhow", x.astype(kernel.dtype),
                         kernel[0, 0])
        return out + bias.astype(out.dtype)[None, None, :, None]


class ResidualBlock(nn.Module):
    """`extractor.py:6-56`: two 3×3 convs + norm + ReLU, optional strided
    downsample shortcut (1×1 conv + norm).

    `nhcw=True`: operands stay in the Pallas NHCW layout end-to-end —
    convs via `PConv` (strided blocks included; the downsample shortcut is
    a strided-slice 1×1 `Conv1x1`), norms on channel axis 2."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    nhcw: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.nhcw:
            y = PConv(self.planes, stride=self.stride, name="conv1")(x)
            y = nn.relu(make_norm(self.norm_fn, self.planes, "norm1",
                                  nhcw=True)(y))
            y = PConv(self.planes, name="conv2")(y)
            y = nn.relu(make_norm(self.norm_fn, self.planes, "norm2",
                                  nhcw=True)(y))
            if self.stride != 1:
                x = Conv1x1(self.planes, stride=self.stride,
                            name="downsample")(x)
                x = make_norm(self.norm_fn, self.planes, "norm3",
                              nhcw=True)(x)
            return nn.relu(x + y)
        y = tconv(self.planes, (3, 3), strides=self.stride, name="conv1")(x)
        y = nn.relu(make_norm(self.norm_fn, self.planes, "norm1")(y))
        y = tconv(self.planes, (3, 3), name="conv2")(y)
        y = nn.relu(make_norm(self.norm_fn, self.planes, "norm2")(y))
        if self.stride != 1:
            x = tconv(self.planes, (1, 1), strides=self.stride,
                        name="downsample")(x)
            x = make_norm(self.norm_fn, self.planes, "norm3")(x)
        return nn.relu(x + y)


def _stem_pallas_default() -> bool:
    # (the kernel's BlockSpec-pipelined input is jax.vmap-batchable, so the
    # stem is safe under the bench's 2-pairs-per-chip vmap; PCFA_PALLAS_STEM=0
    # opts out)
    import os

    import jax

    return (os.environ.get("PCFA_PALLAS_STEM", "1") == "1"
            and jax.default_backend() == "tpu")


def _encoder_nhcw_default() -> bool:
    # layer1 (64-ch, stride-1) through the Pallas NHCW path; see PConv.
    # PCFA_PALLAS_ENCODER: 0 = off, 1 = layer1 (default), 2 = all stages
    # (layer2/3 + output conv stay NHCW; see _encoder_nhcw_deep).
    import os

    import jax

    return (os.environ.get("PCFA_PALLAS_ENCODER", "1") in ("1", "2")
            and jax.default_backend() == "tpu")


def _encoder_nhcw_deep() -> bool:
    # PCFA_PALLAS_ENCODER=2: the strided stages + 1×1 output conv also run
    # in NHCW (Pallas where the tile plan fits, XLA-NHCW fallback where it
    # doesn't — e.g. layer3's odd output height at KITTI size). Off by
    # default until a bench A/B proves it end-to-end (the im2col-adjoint
    # lesson: isolated wins can invert inside the attack closure).
    import os

    return os.environ.get("PCFA_PALLAS_ENCODER", "1") == "2"


class StemConv(nn.Module):
    """The encoders' 7×7/2 RGB stem as a shifted-slab Pallas conv on TPU
    (3 input channels → XLA pads to 128 lanes; see
    `ops/pallas/small_conv.py`). Param tree identical to `nn.Conv`."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 nhcw_out: bool = False) -> jnp.ndarray:
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if (_stem_pallas_default() and x.shape[1] % 2 == 0
                and x.shape[2] % 2 == 0):
            from pcfa_tpu.ops.pallas.small_conv import small_conv2d

            out = small_conv2d(x.transpose(0, 1, 3, 2).astype(kernel.dtype),
                               kernel, bias, None, 2)
            return out if nhcw_out else out.transpose(0, 1, 3, 2)
        import jax

        out = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        return out.transpose(0, 1, 3, 2) if nhcw_out else out


class BasicEncoder(nn.Module):
    """`extractor.py:118-192`: 7×7/2 stem + 3 residual stages (64, 96, 128,
    strides 1/2/2) + 1×1 output conv → ÷8 feature map."""

    output_dim: int = 256
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 depth: int | None = None) -> jnp.ndarray:
        # layer1 runs in the Pallas NHCW layout on TPU (64 channels = half a
        # lane tile under XLA — the round-2 dissection's biggest remaining
        # encoder cost). One transpose back before the strided stages, whose
        # 96/128 channels XLA already tiles well.
        # `depth` truncates the stage chain (1=stem..5=full) — profiling
        # hook only (scripts/profile_encoder.py); apply() with the full
        # param tree tolerates the unused tail.
        nhcw = (_encoder_nhcw_default() and x.shape[1] % 4 == 0
                and x.shape[2] % 2 == 0)
        deep = nhcw and _encoder_nhcw_deep()
        x = StemConv(64, name="conv1")(x, nhcw_out=nhcw)
        x = nn.relu(make_norm(self.norm_fn, 64, "norm1", nhcw=nhcw)(x))
        if depth == 1:
            return x.transpose(0, 1, 3, 2) if nhcw else x
        x = ResidualBlock(64, self.norm_fn, 1, nhcw=nhcw, name="layer1_0")(x)
        x = ResidualBlock(64, self.norm_fn, 1, nhcw=nhcw, name="layer1_1")(x)
        if nhcw and not deep:
            x = x.transpose(0, 1, 3, 2)
        if depth == 2:
            return x.transpose(0, 1, 3, 2) if deep else x
        for i, (dim, stride) in enumerate(((96, 2), (128, 2)), 2):
            x = ResidualBlock(dim, self.norm_fn, stride, nhcw=deep,
                              name=f"layer{i}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, nhcw=deep,
                              name=f"layer{i}_1")(x)
            if depth == i + 1:
                return x.transpose(0, 1, 3, 2) if deep else x
        if deep:
            return Conv1x1(self.output_dim, name="conv2")(x).transpose(
                0, 1, 3, 2)
        return tconv(self.output_dim, (1, 1), name="conv2")(x)


class BottleneckBlock(nn.Module):
    """`extractor.py:60-116`: 1×1 → 3×3(stride) → 1×1 bottleneck with
    optional strided downsample shortcut (used by the RAFT-small encoder)."""

    planes: int
    norm_fn: str = "instance"
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p4 = self.planes // 4
        y = tconv(p4, (1, 1), name="conv1")(x)
        y = nn.relu(make_norm(self.norm_fn, p4, "norm1")(y))
        y = tconv(p4, (3, 3), strides=self.stride, name="conv2")(y)
        y = nn.relu(make_norm(self.norm_fn, p4, "norm2")(y))
        y = tconv(self.planes, (1, 1), name="conv3")(y)
        y = nn.relu(make_norm(self.norm_fn, self.planes, "norm3")(y))
        if self.stride != 1:
            x = tconv(self.planes, (1, 1), strides=self.stride,
                      name="downsample")(x)
            x = make_norm(self.norm_fn, self.planes, "norm4")(x)
        return nn.relu(x + y)


class SmallEncoder(nn.Module):
    """`extractor.py:195-267`: 7×7/2 stem (32) + bottleneck stages
    (32, 64, 96; strides 1/2/2) + 1×1 output conv."""

    output_dim: int = 128
    norm_fn: str = "instance"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = tconv(32, (7, 7), strides=2, name="conv1")(x)
        x = nn.relu(make_norm(self.norm_fn, 32, "norm1")(x))
        for i, (dim, stride) in enumerate(((32, 1), (64, 2), (96, 2)), 1):
            x = BottleneckBlock(dim, self.norm_fn, stride,
                                name=f"layer{i}_0")(x)
            x = BottleneckBlock(dim, self.norm_fn, 1, name=f"layer{i}_1")(x)
        return tconv(self.output_dim, (1, 1), name="conv2")(x)
