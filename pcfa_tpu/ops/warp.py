"""Differentiable sampling / warping / resizing primitives (channels-last).

These are the shared building blocks behind every flow estimator in the zoo
(SURVEY.md §2.5 #7): SpyNet's `Backward` warp (`SpyNet.py:86-102`), PWCNet's
`warp` (`PWCNet.py:166-206`), RAFT/GMA's `bilinear_sampler`
(`raft/utils/utils.py:57-71`), and the various bilinear up-samplings.

All functions are pure jnp (autodiff gives the backward passes the reference
implements by hand in CUDA), use static shapes, and are written to be
bit-compatible with the corresponding `torch.nn.functional` ops:

* `grid_sample`  — torch F.grid_sample (bilinear), both `align_corners`
  conventions, `zeros` / `border` padding.
* `interpolate_bilinear` — torch F.interpolate(mode='bilinear'), both
  `align_corners` conventions, implemented as two separable matmuls so the
  MXU does the interpolation instead of a scalar gather.
* `avg_pool2d` — torch F.avg_pool2d(k, stride=k).

Layout: images (B, H, W, C); point grids (B, Hg, Wg, 2) with (x, y) order in
the last axis, like torch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def coords_grid(batch: int, ht: int, wd: int) -> jnp.ndarray:
    """Pixel-coordinate grid (B, H, W, 2) with (x, y) channels
    (`raft/utils/utils.py:74-77`, channels-last)."""
    y, x = jnp.meshgrid(jnp.arange(ht), jnp.arange(wd), indexing="ij")
    coords = jnp.stack([x, y], axis=-1).astype(jnp.float32)
    return jnp.broadcast_to(coords[None], (batch, ht, wd, 2))


def grid_sample(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sampling with torch `F.grid_sample` semantics.

    img:  (B, H, W, C); grid: (B, Hg, Wg, 2) in [-1, 1], (x, y) order.
    Returns (B, Hg, Wg, C).
    """
    B, H, W, C = img.shape
    x, y = grid[..., 0], grid[..., 1]

    if align_corners:
        ix = (x + 1.0) * 0.5 * (W - 1)
        iy = (y + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((x + 1.0) * W - 1.0) * 0.5
        iy = ((y + 1.0) * H - 1.0) * 0.5

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    flat = img.reshape(B, H * W, C)
    bhw = x.shape  # (B, Hg, Wg)

    def corner(cx, cy, w):
        if padding_mode == "zeros":
            valid = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
            w = jnp.where(valid, w, 0.0)
        cxc = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
        cyc = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
        idx = (cyc * W + cxc).reshape(B, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1).reshape(*bhw, C)
        return vals * w[..., None]

    out = (
        corner(x0, y0, (1 - wx) * (1 - wy))
        + corner(x0 + 1, y0, wx * (1 - wy))
        + corner(x0, y0 + 1, (1 - wx) * wy)
        + corner(x0 + 1, y0 + 1, wx * wy)
    )
    return out


def bilinear_sampler(
    img: jnp.ndarray, coords: jnp.ndarray, mask: bool = False
):
    """RAFT-style sampling at absolute pixel coordinates
    (`raft/utils/utils.py:57-71`): normalize with align_corners=True and
    grid-sample with zero padding."""
    H, W = img.shape[1], img.shape[2]
    xgrid = 2.0 * coords[..., 0] / (W - 1) - 1.0
    ygrid = 2.0 * coords[..., 1] / (H - 1) - 1.0
    grid = jnp.stack([xgrid, ygrid], axis=-1)
    out = grid_sample(img, grid, align_corners=True, padding_mode="zeros")
    if mask:
        m = (xgrid > -1) & (ygrid > -1) & (xgrid < 1) & (ygrid < 1)
        return out, m.astype(img.dtype)
    return out


@functools.lru_cache(maxsize=64)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix matching torch
    F.interpolate. Built host-side once per static shape."""
    if align_corners and out_size > 1:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    x0 = np.floor(src)
    frac = src - x0
    # Edge handling: clamp corner indices into range (torch semantics); the
    # weights still sum to 1 so out-of-range sources read the border value.
    lo = np.clip(x0, 0, in_size - 1).astype(np.int64)
    hi = np.clip(x0 + 1, 0, in_size - 1).astype(np.int64)
    M = np.zeros((out_size, in_size), np.float32)
    np.add.at(M, (np.arange(out_size), lo), 1.0 - frac)
    np.add.at(M, (np.arange(out_size), hi), frac)
    return M


def interpolate_bilinear(
    img: jnp.ndarray,
    out_hw: tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """torch `F.interpolate(..., mode='bilinear')` on (B, H, W, C) arrays,
    expressed as two dense matmuls (MXU-friendly; no gather)."""
    H_out, W_out = out_hw
    Mh = jnp.asarray(_resize_matrix(img.shape[1], H_out, align_corners))
    Mw = jnp.asarray(_resize_matrix(img.shape[2], W_out, align_corners))
    out = jnp.einsum("oh,bhwc->bowc", Mh, img, precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("pw,bowc->bopc", Mw, out, precision=jax.lax.Precision.HIGHEST)
    return out


def upflow(flow: jnp.ndarray, factor: int = 8, align_corners: bool = True) -> jnp.ndarray:
    """Upsample a flow field spatially by `factor` and scale its magnitude
    (`raft/utils/utils.py:80-82` upflow8)."""
    B, H, W, C = flow.shape
    return factor * interpolate_bilinear(
        flow, (factor * H, factor * W), align_corners=align_corners
    )


def avg_pool2d(img: jnp.ndarray, window: int = 2, stride: int | None = None) -> jnp.ndarray:
    """Average pooling on (B, H, W, C), VALID padding — matches torch
    F.avg_pool2d(k, stride)."""
    stride = stride or window
    summed = jax.lax.reduce_window(
        img,
        0.0,
        jax.lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )
    return summed / (window * window)


def resample2d(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """FlowNet2 warp (`resample2d_kernel.cu:16-74`, SURVEY.md §2.5 #3):
    out(x,y) = bilinear(img at (x+u, y+v)), corner indices clamped to the
    borders with weights from the unclamped fracs. Autodiff supplies the two
    backward kernels the reference hand-writes."""
    B, H, W, C = img.shape
    xs = jnp.arange(W, dtype=img.dtype)
    ys = jnp.arange(H, dtype=img.dtype)
    gx = xs[None, None, :] + flow[..., 0]
    gy = ys[None, :, None] + flow[..., 1]
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    a = (gx - x0)[..., None]
    b = (gy - y0)[..., None]

    flat = img.reshape(B, H * W, C)

    def gather(yc, xc):
        yc = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(B, -1, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(B, H, W, C)

    return (
        (1 - a) * (1 - b) * gather(y0, x0)
        + a * (1 - b) * gather(y0, x0 + 1)
        + (1 - a) * b * gather(y0 + 1, x0)
        + a * b * gather(y0 + 1, x0 + 1)
    )
