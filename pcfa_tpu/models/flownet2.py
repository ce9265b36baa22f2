"""FlowNet2 cascade in Flax — FlowNetC → S1 → S2 ∥ SD → Fusion.

Rebuild of `models/FlowNet/{FlowNet2,FlowNetC,FlowNetS,FlowNetSD,
FlowNetFusion,submodules}.py` with the three CUDA extensions replaced by
XLA-native ops:

* `correlation_cuda` (max_displacement=20, stride2=2, 441 ch, zero pad,
  /C normalization, dy-major channel order — `correlation_cuda_kernel.cu:
  85-135`) → `ops.global_correlation`.
* `resample2d_cuda` (bilinear warp, per-corner border clamp —
  `resample2d_kernel.cu:16-74`) → `resample2d` below; autodiff supplies
  both backward kernels the reference hand-writes.
* `channelnorm_cuda` (per-pixel L2 over channels) → `ops.channelnorm`.

Faithful structure (batchNorm=False config, `ownutilities.py:155`):
mean-RGB subtraction over both frames + ÷rgb_max (`FlowNet2.py:114-116`;
with our unit-scale inputs this is `u - mean(u)`), div_flow=20 flow scaling
between stages (`FlowNet2.py:123,135,147,160`), bilinear ×4 upsampling for
C/S1 flows and *nearest* ×4 for S2/SD flows (`FlowNet2.py:36,48,63-64`).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcfa_tpu.ops.channelnorm import channel_norm as channelnorm
from pcfa_tpu.ops.correlation import global_correlation
from pcfa_tpu.ops.warp import interpolate_bilinear, resample2d


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


def _cl_pallas_default() -> bool:
    """Default for CL.use_pallas (separate function so tests can force the
    Pallas conv branch on the CPU backend)."""
    return jax.default_backend() == "tpu"


def _chain_nhcw() -> bool:
    """Chain consecutive Pallas-eligible stem convs in the NHCW layout
    (skip the per-conv NHWC↔NHCW transpose pairs). Layout-only; numerics
    identical. PCFA_FN2_CHAIN=0 opts out for A/B."""
    return os.environ.get("PCFA_FN2_CHAIN", "1") == "1"


class _PConv(nn.Module):
    """Param-tree twin of `nn.Conv` that runs the shifted-slab Pallas
    kernel (`ops/pallas/small_conv.py`) on NHCW with fused LeakyReLU."""

    features: int
    kernel: int
    stride: int

    @nn.compact
    def __call__(self, x, nhcw_in: bool = False, nhcw_out: bool = False):
        c_in = x.shape[2] if nhcw_in else x.shape[-1]
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.kernel, self.kernel, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        from pcfa_tpu.ops.pallas.small_conv import small_conv2d

        if not nhcw_in:
            x = x.transpose(0, 1, 3, 2)
        out = small_conv2d(x.astype(kern.dtype), kern, bias, "leaky",
                           self.stride)
        return out if nhcw_out else out.transpose(0, 1, 3, 2)


class CL(nn.Module):
    """`submodules.conv` (no-BN branch): Conv(bias) + LeakyReLU(0.1).

    On TPU, small-input-channel convs (the encoder heads of every FlowNet
    subnet — XLA pads ≤64 channels to 128 lanes on both matmul axes) run
    through the shifted-slab Pallas kernel with a fused leaky epilogue.

    `nhcw_in`/`nhcw_out` let consecutive Pallas convs hand tensors off in
    the kernel's native NHCW layout (transposes only at chain boundaries);
    the XLA fallback transposes as needed, so the flags are layout hints,
    never a correctness requirement."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x, nhcw_in: bool = False, nhcw_out: bool = False):
        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = _cl_pallas_default()
        c_in = x.shape[2] if nhcw_in else x.shape[-1]
        h = x.shape[1]
        w = x.shape[3] if nhcw_in else x.shape[2]
        if (use_pallas and c_in <= 64 and self.stride in (1, 2)
                and h % self.stride == 0 and w % self.stride == 0):
            return _PConv(self.features, self.kernel, self.stride,
                          name="0")(x, nhcw_in=nhcw_in, nhcw_out=nhcw_out)
        if nhcw_in:
            x = x.transpose(0, 1, 3, 2)
        p = (self.kernel - 1) // 2
        out = _leaky(
            nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=self.stride, padding=[(p, p), (p, p)],
                    name="0")(x)
        )
        return out.transpose(0, 1, 3, 2) if nhcw_out else out


def _decode_pallas_default() -> bool:
    """Pallas fast path for the decode-tail convs (PCFA_FN2_DECODE_PALLAS
    opts out). Round-5 dissection: FlowNetFusion's ÷2/full-res decode
    groups are 16.6 of its 23.2 ms — inter_conv/predict_flow convs with
    C_out ∈ {2, 16, 32} run XLA NHWC at ≤2% lane utilization, exactly the
    regime the shifted-slab NHCW kernel absorbs into the M dimension."""
    return (os.environ.get("PCFA_FN2_DECODE_PALLAS", "1") == "1"
            and jax.default_backend() == "tpu")


class PlainConv(nn.Module):
    """Param-tree twin of a bias'd stride-1 `nn.Conv` (names kernel/bias)
    with an optional activation and a Pallas fast path for lane-starved
    channel counts (C_out ≤ 32; the planner channel-pads c_in = 82/162)."""

    features: int
    kernel: int = 3
    act: str | None = None

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (self.kernel, self.kernel, c_in, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if (_decode_pallas_default() and self.features <= 32
                and c_in <= 192):
            from pcfa_tpu.ops.pallas.small_conv import small_conv2d

            out = small_conv2d(
                x.transpose(0, 1, 3, 2).astype(kern.dtype), kern, bias,
                self.act, 1)
            return out.transpose(0, 1, 3, 2)
        p = (self.kernel - 1) // 2
        out = jax.lax.conv_general_dilated(
            x, kern.astype(x.dtype), window_strides=(1, 1),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(x.dtype)
        return _leaky(out) if self.act == "leaky" else out


class IConv(nn.Module):
    """`submodules.i_conv`: conv without activation (Sequential of one)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return PlainConv(self.features, name="0")(x)


class _DeconvP(nn.Module):
    """Param-tree twin of `nn.ConvTranspose((4,4), stride 2, SAME)` that
    runs as ONE stride-1 3×3 NHCW Pallas conv + depth-to-space.

    nn.ConvTranspose(SAME, k=4, s=2) satisfies (verified numerically,
    round 5): out[o] = Σᵢ x[i]·wf[o−2i+1] with wf the spatially flipped
    kernel. Splitting o by parity r, each parity reads exactly TWO taps
    at input offsets ⊆ {−1, 0, +1}: r=0 → {−1: wf[3], 0: wf[1]},
    r=1 → {0: wf[2], +1: wf[0]}. All four (ry, rx) parities therefore
    embed into one CENTERED 3×3 kernel with C_out′ = 4·C_out, and the
    output interleaves back to (2H, 2W, C_out). The XLA ConvTranspose
    lowers with C_out ∈ {2..32} lanes (≤2% MXU utilization — deconv0
    alone was 11.9 ms of FlowNetFusion's 22 ms, round-5 dissection);
    the combined conv runs M = TH·4·C_out, K = rows·G full-ish tiles."""

    features: int
    use_bias: bool = True
    act: str | None = None

    @nn.compact
    def __call__(self, x):
        B, H, W, c_in = x.shape
        co = self.features
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          (4, 4, c_in, co))
        bias = (self.param("bias", nn.initializers.zeros, (co,))
                if self.use_bias else None)
        if not _deconv_pallas_ok(c_in, co):
            out = jax.lax.conv_transpose(
                x, kern.astype(x.dtype), strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if bias is not None:
                out = out + bias.astype(out.dtype)
            return _leaky(out) if self.act == "leaky" else out
        from pcfa_tpu.ops.pallas.small_conv import small_conv2d

        wf = kern[::-1, ::-1]
        w3 = jnp.zeros((3, 3, c_in, 4 * co), kern.dtype)
        maps = ({0: 3, 1: 1}, {1: 2, 2: 0})  # offset+1 → wf tap, per parity
        for ry in (0, 1):
            for rx in (0, 1):
                s = (ry * 2 + rx) * co
                for a, ty in maps[ry].items():
                    for b_, tx in maps[rx].items():
                        w3 = w3.at[a, b_, :, s:s + co].set(wf[ty, tx])
        b4 = jnp.tile(bias, 4) if bias is not None else jnp.zeros(
            (4 * co,), kern.dtype)
        out = small_conv2d(x.transpose(0, 1, 3, 2).astype(kern.dtype),
                           w3, b4, self.act, 1)  # (B, H, 4co, W) NHCW
        out = out.transpose(0, 1, 3, 2).reshape(B, H, W, 2, 2, co)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, co)


def _deconv_pallas_ok(c_in: int, features: int) -> bool:
    return _decode_pallas_default() and features <= 32 and c_in <= 192


class Deconv(nn.Module):
    """`submodules.deconv`: ConvTranspose2d(4,2,1) + LeakyReLU(0.1)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return _DeconvP(self.features, act="leaky", name="0")(x)


def upflow_deconv(features: int, use_bias: bool, name: str):
    """Bare `ConvTranspose2d(2, 2, 4, 2, 1)` flow upsampler."""
    return _DeconvP(features, use_bias=use_bias, name=name)


def predict_flow(name: str):
    return PlainConv(2, name=name)


def upsample_nearest4(x: jnp.ndarray) -> jnp.ndarray:
    """torch nn.Upsample(scale_factor=4, mode='nearest')."""
    return x.repeat(4, axis=1).repeat(4, axis=2)


class FlowNetC(nn.Module):
    """`FlowNetC.py:13-128` (batchNorm=False). Input: 6-ch stacked frames."""

    #: None → use the fused Pallas correlation kernel on TPU backends
    use_pallas: bool | None = None

    @nn.compact
    def __call__(self, x):
        x1, x2 = x[..., :3], x[..., 3:]
        conv1 = CL(64, 7, 2, name="conv1")
        conv2 = CL(128, 5, 2, name="conv2")
        conv3 = CL(256, 5, 2, name="conv3")

        ch = _chain_nhcw()  # conv1→conv2 hand-off stays NHCW (conv3 is XLA)
        c1a = conv1(x1, nhcw_out=ch)
        c2a = conv2(c1a, nhcw_in=ch)
        c3a = conv3(c2a)
        c3b = conv3(conv2(conv1(x2, nhcw_out=ch), nhcw_in=ch))

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas:
            from pcfa_tpu.ops.pallas import global_correlation_pallas

            corr = _leaky(global_correlation_pallas(c3a, c3b, 20, 2))
        else:
            corr = _leaky(global_correlation(c3a, c3b, 20, 2))
        redir = CL(32, 1, name="conv_redir")(c3a)
        x = CL(256, name="conv3_1")(jnp.concatenate([redir, corr], -1))

        out_conv3_1 = x
        out_conv4 = CL(512, name="conv4_1")(CL(512, 3, 2, name="conv4")(x))
        out_conv5 = CL(512, name="conv5_1")(CL(512, 3, 2, name="conv5")(out_conv4))
        out_conv6 = CL(1024, name="conv6_1")(CL(1024, 3, 2, name="conv6")(out_conv5))

        flow6 = predict_flow("predict_flow6")(out_conv6)
        flow6_up = upflow_deconv(2, True, "upsampled_flow6_to_5")(flow6)
        out_deconv5 = Deconv(512, name="deconv5")(out_conv6)

        concat5 = jnp.concatenate([out_conv5, out_deconv5, flow6_up], -1)
        flow5 = predict_flow("predict_flow5")(concat5)
        flow5_up = upflow_deconv(2, True, "upsampled_flow5_to_4")(flow5)
        out_deconv4 = Deconv(256, name="deconv4")(concat5)
        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], -1)

        flow4 = predict_flow("predict_flow4")(concat4)
        flow4_up = upflow_deconv(2, True, "upsampled_flow4_to_3")(flow4)
        out_deconv3 = Deconv(128, name="deconv3")(concat4)
        concat3 = jnp.concatenate([out_conv3_1, out_deconv3, flow4_up], -1)

        flow3 = predict_flow("predict_flow3")(concat3)
        flow3_up = upflow_deconv(2, True, "upsampled_flow3_to_2")(flow3)
        out_deconv2 = Deconv(64, name="deconv2")(concat3)
        concat2 = jnp.concatenate([c2a, out_deconv2, flow3_up], -1)

        return predict_flow("predict_flow2")(concat2)


class FlowNetS(nn.Module):
    """`FlowNetS.py:15-94` (batchNorm=False); 12-ch input in the cascade."""

    @nn.compact
    def __call__(self, x):
        ch = _chain_nhcw()  # conv1→conv2 hand-off (out_conv1 has no skip)
        out_conv1 = CL(64, 7, 2, name="conv1")(x, nhcw_out=ch)
        out_conv2 = CL(128, 5, 2, name="conv2")(out_conv1, nhcw_in=ch)
        out_conv3 = CL(256, name="conv3_1")(CL(256, 5, 2, name="conv3")(out_conv2))
        out_conv4 = CL(512, name="conv4_1")(CL(512, 3, 2, name="conv4")(out_conv3))
        out_conv5 = CL(512, name="conv5_1")(CL(512, 3, 2, name="conv5")(out_conv4))
        out_conv6 = CL(1024, name="conv6_1")(CL(1024, 3, 2, name="conv6")(out_conv5))

        flow6 = predict_flow("predict_flow6")(out_conv6)
        flow6_up = upflow_deconv(2, False, "upsampled_flow6_to_5")(flow6)
        out_deconv5 = Deconv(512, name="deconv5")(out_conv6)

        concat5 = jnp.concatenate([out_conv5, out_deconv5, flow6_up], -1)
        flow5 = predict_flow("predict_flow5")(concat5)
        flow5_up = upflow_deconv(2, False, "upsampled_flow5_to_4")(flow5)
        out_deconv4 = Deconv(256, name="deconv4")(concat5)

        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], -1)
        flow4 = predict_flow("predict_flow4")(concat4)
        flow4_up = upflow_deconv(2, False, "upsampled_flow4_to_3")(flow4)
        out_deconv3 = Deconv(128, name="deconv3")(concat4)

        concat3 = jnp.concatenate([out_conv3, out_deconv3, flow4_up], -1)
        flow3 = predict_flow("predict_flow3")(concat3)
        flow3_up = upflow_deconv(2, False, "upsampled_flow3_to_2")(flow3)
        out_deconv2 = Deconv(64, name="deconv2")(concat3)

        concat2 = jnp.concatenate([out_conv2, out_deconv2, flow3_up], -1)
        return predict_flow("predict_flow2")(concat2)


class FlowNetSD(nn.Module):
    """`FlowNetSD.py:11-106` (batchNorm=False); 6-ch input."""

    @nn.compact
    def __call__(self, x):
        ch = _chain_nhcw()  # conv0→conv1→conv1_1 all Pallas-eligible, no skips
        out_conv0 = CL(64, name="conv0")(x, nhcw_out=ch)
        out_conv1 = CL(128, name="conv1_1")(
            CL(64, 3, 2, name="conv1")(out_conv0, nhcw_in=ch, nhcw_out=ch),
            nhcw_in=ch)
        out_conv2 = CL(128, name="conv2_1")(CL(128, 3, 2, name="conv2")(out_conv1))
        out_conv3 = CL(256, name="conv3_1")(CL(256, 3, 2, name="conv3")(out_conv2))
        out_conv4 = CL(512, name="conv4_1")(CL(512, 3, 2, name="conv4")(out_conv3))
        out_conv5 = CL(512, name="conv5_1")(CL(512, 3, 2, name="conv5")(out_conv4))
        out_conv6 = CL(1024, name="conv6_1")(CL(1024, 3, 2, name="conv6")(out_conv5))

        flow6 = predict_flow("predict_flow6")(out_conv6)
        flow6_up = upflow_deconv(2, True, "upsampled_flow6_to_5")(flow6)
        out_deconv5 = Deconv(512, name="deconv5")(out_conv6)

        concat5 = jnp.concatenate([out_conv5, out_deconv5, flow6_up], -1)
        inter5 = IConv(512, name="inter_conv5")(concat5)
        flow5 = predict_flow("predict_flow5")(inter5)
        flow5_up = upflow_deconv(2, True, "upsampled_flow5_to_4")(flow5)
        out_deconv4 = Deconv(256, name="deconv4")(concat5)

        concat4 = jnp.concatenate([out_conv4, out_deconv4, flow5_up], -1)
        inter4 = IConv(256, name="inter_conv4")(concat4)
        flow4 = predict_flow("predict_flow4")(inter4)
        flow4_up = upflow_deconv(2, True, "upsampled_flow4_to_3")(flow4)
        out_deconv3 = Deconv(128, name="deconv3")(concat4)

        concat3 = jnp.concatenate([out_conv3, out_deconv3, flow4_up], -1)
        inter3 = IConv(128, name="inter_conv3")(concat3)
        flow3 = predict_flow("predict_flow3")(inter3)
        flow3_up = upflow_deconv(2, True, "upsampled_flow3_to_2")(flow3)
        out_deconv2 = Deconv(64, name="deconv2")(concat3)

        concat2 = jnp.concatenate([out_conv2, out_deconv2, flow3_up], -1)
        inter2 = IConv(64, name="inter_conv2")(concat2)
        return predict_flow("predict_flow2")(inter2)


class FlowNetFusion(nn.Module):
    """`FlowNetFusion.py:11-66` (batchNorm=False); 11-ch input."""

    @nn.compact
    def __call__(self, x):
        ch = _chain_nhcw()  # conv1→conv1_1 only: conv0's output feeds concat0
        out_conv0 = CL(64, name="conv0")(x)
        out_conv1 = CL(128, name="conv1_1")(
            CL(64, 3, 2, name="conv1")(out_conv0, nhcw_out=ch), nhcw_in=ch)
        out_conv2 = CL(128, name="conv2_1")(CL(128, 3, 2, name="conv2")(out_conv1))

        flow2 = predict_flow("predict_flow2")(out_conv2)
        flow2_up = upflow_deconv(2, True, "upsampled_flow2_to_1")(flow2)
        out_deconv1 = Deconv(32, name="deconv1")(out_conv2)

        concat1 = jnp.concatenate([out_conv1, out_deconv1, flow2_up], -1)
        inter1 = IConv(32, name="inter_conv1")(concat1)
        flow1 = predict_flow("predict_flow1")(inter1)
        flow1_up = upflow_deconv(2, True, "upsampled_flow1_to_0")(flow1)
        out_deconv0 = Deconv(16, name="deconv0")(concat1)

        concat0 = jnp.concatenate([out_conv0, out_deconv0, flow1_up], -1)
        inter0 = IConv(16, name="inter_conv0")(concat0)
        return predict_flow("predict_flow0")(inter0)


class FlowNet2(nn.Module):
    """`FlowNet2.py:23-178` (fp16=False, rgb_max=255, batchNorm=False,
    div_flow=20). Takes unit-range (img1, img2) per the zoo contract —
    equivalent to the reference's [0,255] stacked input after its
    `(inputs - rgb_mean)/rgb_max` entry normalization."""

    div_flow: float = 20.0

    @nn.compact
    def __call__(self, image1: jnp.ndarray, image2: jnp.ndarray) -> jnp.ndarray:
        # per-sample/channel mean over BOTH frames (`FlowNet2.py:114-116`)
        both = jnp.stack([image1, image2], axis=1)
        rgb_mean = both.mean(axis=(1, 2, 3), keepdims=True)[:, 0]
        x1 = image1 - rgb_mean
        x2 = image2 - rgb_mean
        x = jnp.concatenate([x1, x2], axis=-1)

        # --- FlowNetC + warp/diff bootstrap ---------------------------------
        flow_c2 = FlowNetC(name="flownetc")(x)
        flow_c = interpolate_bilinear(
            flow_c2 * self.div_flow,
            (4 * flow_c2.shape[1], 4 * flow_c2.shape[2]),
        )
        warped1 = resample2d(x2, flow_c)
        norm_diff = channelnorm(x1 - warped1)
        concat1 = jnp.concatenate(
            [x, warped1, flow_c / self.div_flow, norm_diff], axis=-1
        )

        # --- FlowNetS1 -------------------------------------------------------
        flow_s1_2 = FlowNetS(name="flownets_1")(concat1)
        flow_s1 = interpolate_bilinear(
            flow_s1_2 * self.div_flow,
            (4 * flow_s1_2.shape[1], 4 * flow_s1_2.shape[2]),
        )
        warped1 = resample2d(x2, flow_s1)
        norm_diff = channelnorm(x1 - warped1)
        concat2 = jnp.concatenate(
            [x, warped1, flow_s1 / self.div_flow, norm_diff], axis=-1
        )

        # --- FlowNetS2 (nearest ×4, `FlowNet2.py:147`) -----------------------
        flow_s2_2 = FlowNetS(name="flownets_2")(concat2)
        flow_s2 = upsample_nearest4(flow_s2_2 * self.div_flow)
        norm_flow_s2 = channelnorm(flow_s2)
        diff_s2 = resample2d(x2, flow_s2)
        diff_s2_img1 = channelnorm(x1 - diff_s2)

        # --- FlowNetSD (÷div_flow + nearest ×4, `FlowNet2.py:159-160`) -------
        flow_sd_2 = FlowNetSD(name="flownets_d")(x)
        flow_sd = upsample_nearest4(flow_sd_2 / self.div_flow)
        norm_flow_sd = channelnorm(flow_sd)
        diff_sd = resample2d(x2, flow_sd)
        diff_sd_img1 = channelnorm(x1 - diff_sd)

        # --- Fusion ----------------------------------------------------------
        concat3 = jnp.concatenate(
            [x1, flow_sd, flow_s2, norm_flow_sd, norm_flow_s2,
             diff_sd_img1, diff_s2_img1], axis=-1,
        )
        return FlowNetFusion(name="flownetfusion")(concat3)
