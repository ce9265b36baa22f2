"""Shifted-slab Pallas conv for tiny channel counts (stride 1–2).

Why this exists: XLA lowers every NHWC conv onto the MXU by padding both the
input- and output-channel axes to 128 lanes. SpyNet's `Basic` blocks
(`SpyNet.py:61-71`: five 7×7 convs, 8→32→64→32→16→2 channels) therefore run
at 1.5–6% MXU utilization — measured on v5e, a full SpyNet forward+backward
costs as much as RAFT's despite 30× fewer FLOPs, and ~95% of that is these
convs (see CLAUDE.md round-2 roadmap; warps are ~12 ms). The stride-2 mode
covers the encoder heads of the PWCNet/FlowNet family (3–64 input channels
at full resolution). Measured full-model gains: SpyNet 2.3× fwd+bwd,
PWCNet attack +16%, FlowNet2 +4.6% (its cost sits in the wide layers).

The kernel reorganizes the conv so BOTH matmul dimensions are hardware-sized
without materializing im2col patches:

  * Work in **NHCW** layout: lanes = image width (huge), sublanes = channels.
  * Each grid step covers TH output rows. One DMA brings the (TH+k−1)-row ×
    G-channel input slab into VMEM; reshaping it to ((TH+k−1)·G, W_lanes) is
    layout-free (leading-dim merge, G a multiple of 8).
  * The k horizontal taps become **lane-offset slices** of that one slab —
    no data movement at all.
  * The k vertical taps and the TH output rows are absorbed into
    host-precomputed block-Toeplitz weight matrices Ŵ[g,dx] of shape
    (TH·C_out, (TH+k−1)·G):  Ŵ[t·C_out+o, (t+dy)·G+c] = W[o, gG+c, dy, dx].
    K = (TH+k−1)·G and M = TH·C_out are both chosen ≈128 → full MXU tiles.
  * out_stack(M, W) = Σ_g Σ_dx Ŵ[g,dx] @ slab_g[:, dx:dx+W], then fused
    bias + ReLU, stored per-t as contiguous (C_out, W) planes (NHCW again,
    so a 5-conv chain needs no intermediate transposes).

The only overhead vs. ideal is the Toeplitz zero-padding factor
k/(TH+k−1) (7/8 at TH=2) and residual M/K padding — ~4–8× faster than the
XLA convs at SpyNet's channel counts on v5e.

Replaces no reference native op (the reference runs these convs through
cuDNN); it is the TPU answer to the same "hot op the framework must own"
problem as SURVEY.md §2.5. Backward: `jax.custom_vjp` — dx reuses this very
kernel with spatially-flipped, channel-transposed weights (stride-1 SAME
conv transpose identity); dW/db are cheap XLA contractions (unused in the
attack: networks are frozen, gradients flow only to inputs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _plan(c_in: int, c_out: int, Ho: int, k: int,
          stride: int = 1) -> tuple[int, int]:
    """Pick (TH output rows per grid step, G input-channel group size)
    maximizing estimated MXU efficiency: Toeplitz-validity × K-padding ×
    M-padding. `Ho` is the OUTPUT height."""
    best, best_eff = (2, min(8, _round_up(c_in, 8))), -1.0
    for th in (2, 4, 6, 8):
        if Ho % th:
            continue
        rows = stride * th + k - 1
        for g in (8, 16, 32):
            gg = min(g, _round_up(c_in, 8))
            # non-divisible groups are legal (the forward zero-pads the
            # channel axis to c_pad) — they just waste c_pad/c_in of the
            # K work, priced into eff below (FlowNetFusion's decode tail
            # has c_in = 82/162)
            c_pad = _round_up(c_in, gg)
            K = rows * gg
            M = th * c_out
            if K > 512:
                continue
            eff = (
                (k / rows)
                * (K / _round_up(K, 128))
                * (min(M, 128) / 128)
                * (c_in / c_pad)
            )
            # VMEM guard: slab + Ŵ + acc + out block (see _forward)
            grps = _round_up(c_in, gg) // gg
            approx = (rows * gg + grps * k * M * K / 896 + 2 * M) * 896 * 4
            if approx > 11 * 2**20:
                continue
            if eff > best_eff:
                best, best_eff = (th, gg), eff
    return best


def _pack_weights(kernel: jnp.ndarray, TH: int, G: int,
                  stride: int = 1) -> jnp.ndarray:
    """(k, k, C_in, C_out) HWIO → Ŵ (grps, k, TH·C_out, (s·TH+k−1)·G).

    Ŵ[g, dx, t·C_out+o, (s·t+dy)·G+c] = kernel[dy, dx, gG+c, o]."""
    k = kernel.shape[0]
    c_in, c_out = kernel.shape[2], kernel.shape[3]
    c_pad = _round_up(c_in, G)
    if c_pad != c_in:
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, c_pad - c_in), (0, 0)))
    grps = c_pad // G
    rows = stride * TH + k - 1
    # (k_dy, k_dx, grps, G, O) → per (g, dx): (O, dy, c) blocks
    w = kernel.reshape(k, k, grps, G, c_out)
    w = w.transpose(2, 1, 4, 0, 3)          # (grps, dx, O, dy, G)
    w = w.reshape(grps, k, c_out, k * G)    # columns = (dy, c)
    out = jnp.zeros((grps, k, TH * c_out, rows * G), kernel.dtype)
    for t in range(TH):
        out = out.at[
            :, :, t * c_out:(t + 1) * c_out,
            stride * t * G:(stride * t + k) * G
        ].set(w)
    return out


def _pick_wblk(WN: int, target: int = 768) -> int:
    """Largest 128-multiple divisor of WN ≤ target (bounds every VMEM
    buffer regardless of image width — wide rows are split over a third
    grid dimension)."""
    d = min(WN, target)
    while WN % d:
        d -= 128
    return d


def _kernel(slab_ref, what_ref, bias_ref, out_ref, *, k: int,
            TH: int, G: int, grps: int, c_out: int, WBLK: int,
            stride: int, act: str | None):
    """slab_ref block: (1, 1, 1, s, rows, C_pad, WL) — this grid step's
    lane-phase-split input slab (phase q holds virtual lanes ℓ ≡ q mod s,
    so the stride-s horizontal tap dx is a contiguous lane-offset slice
    dx//s of phase dx%s). Slabs are pre-gathered with their halos in XLA
    and pipelined by Pallas as ordinary VMEM blocks — which keeps the
    kernel `jax.vmap`-batchable (a raw HBM ref is not)."""
    rows = stride * TH + k - 1
    M = TH * c_out
    WL = WBLK + 128

    acc = jnp.zeros((M, WBLK), jnp.float32)
    for g in range(grps):
        for q in range(stride):
            s2 = slab_ref[0, 0, 0, q, :, g * G:(g + 1) * G, :].reshape(
                rows * G, WL)
            for a in range((k - q + stride - 1) // stride):
                dx = stride * a + q
                # bf16 operands must pin DEFAULT precision: a global
                # jax_default_matmul_precision=highest (the CLI default)
                # reaches into the kernel and Mosaic rejects
                # HIGHEST-on-bf16 dots ("Bad lhs type")
                prec = (jax.lax.Precision.DEFAULT
                        if s2.dtype == jnp.bfloat16 else None)
                acc = acc + jnp.dot(
                    what_ref[g, dx],
                    s2[:, a:a + WBLK],
                    precision=prec,
                    preferred_element_type=jnp.float32,
                )
    acc = acc + bias_ref[:]
    if act == "relu":
        acc = jnp.maximum(acc, 0.0)
    elif act == "leaky":
        acc = jnp.where(acc > 0, acc, 0.1 * acc)
    acc = acc.astype(out_ref.dtype)
    for t in range(TH):
        out_ref[0, t, :, :] = acc[t * c_out:(t + 1) * c_out, :]


def _forward(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
             act: str | bool | None, interpret: bool = False,
             plan: tuple[int, int] | None = None,
             stride: int = 1) -> jnp.ndarray:
    """x (B, H, C_in, W) NHCW → (B, H/s, C_out, W/s); SAME zero-pad
    (torch Conv2d(k, stride=s, padding=k//2) semantics; H, W divisible
    by s). `act`: None | 'relu' | 'leaky' (0.1)."""
    if act is True:
        act = "relu"
    elif act is False:
        act = None
    B, H, c_in, W = x.shape
    s = stride
    k = kernel.shape[0]
    c_out = kernel.shape[3]
    p = k // 2
    Ho, Wo = H // s, W // s
    TH, G = plan if plan is not None else _plan(c_in, c_out, Ho, k, s)
    if H % s or W % s or Ho % TH:
        # No candidate tile height covers the output (odd Ho, e.g. SpyNet at
        # H=160 → 5-row coarsest level): the grid would truncate and leave the
        # tail rows unwritten. Correctness over speed — use the XLA path.
        return conv_reference(x, kernel, bias, act, stride=s)
    c_pad = _round_up(c_in, G)
    grps = c_pad // G
    rows = s * TH + k - 1
    WoN = _round_up(Wo, 128)
    WBLK = _pick_wblk(WoN)
    WqL = WoN + 128

    # virtual padded lanes ℓ = s·x_out + dx hold input column ℓ − p;
    # split into s lane phases so every tap is a contiguous slice
    WL = WBLK + 128
    xp = jnp.zeros((B, H + 2 * p, c_pad, s * WqL), x.dtype)
    xp = xp.at[:, p:p + H, :c_in, p:p + W].set(x)
    xps = jnp.stack([xp[..., q::s] for q in range(s)], axis=1)
    # pre-gather each grid step's halo'd slab (rows overlap by k−1, lanes
    # by 128): ordinary VMEM blocks that Pallas double-buffers — and that
    # jax.vmap can batch (a raw HBM ref cannot be)
    n_i, n_w = Ho // TH, WoN // WBLK
    slabs = jnp.stack([
        jnp.stack([
            xps[:, :, s * i * TH:s * i * TH + rows, :,
                wb * WBLK:wb * WBLK + WL]
            for wb in range(n_w)
        ], axis=1)
        for i in range(n_i)
    ], axis=1)  # (B, n_i, n_w, s, rows, C_pad, WL)
    what = _pack_weights(kernel, TH, G, s).astype(x.dtype)
    bias_m = jnp.tile(bias.astype(jnp.float32), TH)[:, None]  # (TH·C_out, 1)

    M = TH * c_out
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, TH=TH, G=G, grps=grps, c_out=c_out,
                          WBLK=WBLK, stride=s, act=act),
        out_shape=jax.ShapeDtypeStruct((B, Ho, c_out, WoN), x.dtype),
        grid=(B, n_i, n_w),
        in_specs=[
            pl.BlockSpec((1, 1, 1, s, rows, c_pad, WL),
                         lambda b, i, w: (b, i, w, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((grps, k, M, rows * G),
                         lambda b, i, w: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, 1), lambda b, i, w: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TH, c_out, WBLK),
                               lambda b, i, w: (b, i, 0, w),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(slabs, what, bias_m)
    return out[:, :, :, :Wo]


def conv_reference(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                   act: str | bool | None, stride: int = 1) -> jnp.ndarray:
    """XLA reference with identical NHCW semantics (used on CPU + in tests)."""
    k = kernel.shape[0]
    p = k // 2
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride, stride),
        padding=((p, p), (p, p)),
        dimension_numbers=("NHCW", "HWIO", "NHCW"),
    ) + bias[None, None, :, None]
    if act in ("relu", True):
        return jnp.maximum(out, 0.0)
    if act == "leaky":
        return jnp.where(out > 0, out, 0.1 * out)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def small_conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                 act: str | bool | None = None,
                 stride: int = 1) -> jnp.ndarray:
    """SAME conv (stride 1 or 2) on NHCW input via the shifted-slab Pallas
    kernel, with optional fused bias + ReLU/LeakyReLU(0.1) epilogue.
    Differentiable (custom VJP)."""
    return _forward(x, kernel, bias, act, stride=stride)


def _fwd(x, kernel, bias, act, stride):
    out = _forward(x, kernel, bias, act, stride=stride)
    save_out = out if act in ("relu", "leaky", True) else None
    return out, (x, kernel, save_out)


def _strided_dx_mode() -> str:
    """'dilate' (zero-dilate g + Pallas stride-1 transpose, the long-time
    default) or 'xla' (native conv-transpose vjp). Isolated slope timing at
    the RAFT stem shape puts XLA at 8.4 ms vs dilate's 11.5 (BASELINE.md
    round 3) — but the im2col-adjoint lesson says isolated dx wins can
    invert end-to-end, so the default only flips on a bench A/B."""
    import os

    return os.environ.get("PCFA_DX_STRIDED", "dilate")


def _im2col_dx_enabled() -> bool:
    # default OFF: the adjoint wins in isolation (stem fwd+bwd 12.5 → 9.3
    # ms slope-timed) but LOSES 10% end-to-end in the remat-off RAFT
    # closure (bench A/B 247.4× → 223.1× — the B·Ho·Wo·k²C_in cols
    # temporaries, ~138 MB per fnet application, pressure HBM scheduling).
    # Measure end-to-end before flipping (the round-2 packed-warp lesson
    # in reverse: isolated slope wins do not compose).
    import os

    return os.environ.get("PCFA_DX_IM2COL", "0") == "1"


def _dx_im2col_adjoint(g: jnp.ndarray, kernel: jnp.ndarray, H: int,
                       W: int, s: int) -> jnp.ndarray:
    """Strided-conv input gradient as ONE well-shaped MXU matmul + tap adds.

    The conv-transpose formulations put the tiny C_in on the matmul M axis
    (the stem's dx has C_in = 3 → M = TH·3 rows against 128-row tiles:
    measured 11.2 ms of the RAFT encoders' 12.5 ms stem fwd+bwd). The
    im2col ADJOINT instead computes per forward-output pixel the full
    k·k·C_in window cotangent with a (B·Ho·Wo, C_out) @ (C_out, k²C_in)
    matmul — M is the huge pixel axis, K = C_out — then scatters the k²
    taps onto the input grid with static pad-shift adds, grouped by the
    stride-s parity class of each tap so every add lands on a dense
    output-lattice buffer, and one transpose-reshape interleave assembles
    dx. Pure XLA (fp32-safe — no scoped-VMEM pallas output). Gated to
    k²·C_in ≤ 256 (the cols buffer is B·Ho·Wo·k²C_in)."""
    k = kernel.shape[0]
    p = k // 2
    B, Ho, Co, Wo = g.shape
    C = kernel.shape[2]
    prec = (jax.lax.Precision.DEFAULT if g.dtype == jnp.bfloat16 else None)
    wmat = kernel.reshape(k * k * C, Co).astype(g.dtype)
    gm = g.transpose(0, 1, 3, 2).reshape(B * Ho * Wo, Co)
    cols = jnp.dot(gm, wmat.T, precision=prec,
                   preferred_element_type=jnp.float32)
    cols = cols.reshape(B, Ho, Wo, k, k, C).astype(g.dtype)

    # padded-input coordinate u = s·y + dy → parity py = dy % s, lattice
    # row y + dy//s; per parity class the taps are static shifted adds.
    # (A (C, B, YL, XL) lane-friendly accumulation layout was measured
    # SLOWER end-to-end, 11.7 vs 9.3 ms — the extra relayouts cost more
    # than the sublane padding they avoid.)
    Hp, Wp = H + 2 * p, W + 2 * p
    YL, XL = -(-Hp // s), -(-Wp // s)
    lattice = [[jnp.zeros((B, YL, C, XL), g.dtype) for _ in range(s)]
               for _ in range(s)]
    for dy in range(k):
        ay, py = dy // s, dy % s
        for dxx in range(k):
            ax, px = dxx // s, dxx % s
            tap = cols[:, :, :, dy, dxx, :].transpose(0, 1, 3, 2)
            tap = jnp.pad(tap, ((0, 0), (ay, YL - Ho - ay), (0, 0),
                                (ax, XL - Wo - ax)))
            lattice[py][px] = lattice[py][px] + tap
    full = jnp.stack([jnp.stack(row, 0) for row in lattice], 0)
    # (py, px, B, YL, C, XL) → (B, YL, py, C, XL, px) → interleave
    dxp = full.transpose(2, 3, 0, 4, 5, 1).reshape(B, YL * s, C, XL * s)
    return dxp[:, p:p + H, :, p:p + W]


def _bwd(act, stride, res, g):
    x, kernel, out = res
    if act in ("relu", True):
        g = g * (out > 0)
    elif act == "leaky":
        g = g * jnp.where(out > 0, 1.0, 0.1).astype(g.dtype)
    k = kernel.shape[0]
    p = k // 2
    kernel_t = kernel[::-1, ::-1].transpose(0, 1, 3, 2)
    zeros = jnp.zeros((kernel.shape[2],), g.dtype)
    if stride > 1 and (x.shape[1] % stride or x.shape[3] % stride):
        # Odd H/W under stride: the FORWARD fell back to conv_reference with
        # ceil output semantics (Ho = ceil(H/s)), while every branch below
        # assumes Ho = H//s — mirror the fallback's vjp exactly for all of
        # dx/dw/db instead (g already carries the activation cotangent).
        zeros_b = jnp.zeros((kernel.shape[3],), g.dtype)
        _, vjp = jax.vjp(
            lambda a, w: conv_reference(a, w, zeros_b, None, stride=stride),
            x, kernel)
        dx, dw = vjp(g)
        db = jnp.sum(g, axis=(0, 1, 3))
        return dx, dw, db
    if stride == 1:
        # dx: stride-1 SAME conv-transpose identity — same kernel, weights
        # spatially flipped and channel-transposed
        dx = _forward(g, kernel_t, zeros, None)
    elif k * k * kernel.shape[2] <= 256 and _im2col_dx_enabled():
        dx = _dx_im2col_adjoint(g, kernel, x.shape[1], x.shape[3], stride)
    elif g.dtype == jnp.bfloat16 and _strided_dx_mode() != "xla":
        # strided conv transpose = zero-dilate g (interior padding s−1)
        # back to the input grid, then the SAME stride-1 transpose above.
        # s²× redundant MACs over the zeros, but they run on this kernel's
        # full-MXU tiles — still far ahead of XLA's lane-padded transpose
        # at these channel counts. bf16 only: at fp32 XLA may place the
        # small dx output in scoped VMEM and double-buffer past the 16 MB
        # AOT limit (measured: RAFT stem dx f32[2,376,3,1280] → 22.14M).
        B, Ho, Co, Wo = g.shape
        H, W = x.shape[1], x.shape[3]
        s = stride
        g_dil = jax.lax.pad(
            g, jnp.zeros((), g.dtype),
            ((0, 0, 0),
             (0, H - (s * (Ho - 1) + 1), s - 1),
             (0, 0, 0),
             (0, W - (s * (Wo - 1) + 1), s - 1)),
        )
        dx = _forward(g_dil, kernel_t, zeros, None)
    else:
        # fp32 strided transpose via XLA (see above)
        _, vjp = jax.vjp(
            lambda a: jax.lax.conv_general_dilated(
                a, kernel, window_strides=(stride, stride),
                padding=((p, p), (p, p)),
                dimension_numbers=("NHCW", "HWIO", "NHCW"),
            ), x,
        )
        (dx,) = vjp(g)
    # dW[dy, dx, c, o] = Σ_{b,y,w} xpad[b, s·y+dy, c, s·w+dx] · g[b, y, o, w]
    B, H, _, W = x.shape
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (p, p)))
    Ho, Wo = H // stride, W // stride
    taps = []
    for dy in range(k):
        row = []
        for dxi in range(k):
            sl = jax.lax.dynamic_slice(
                xp, (0, dy, 0, dxi),
                (B, stride * (Ho - 1) + 1, x.shape[2],
                 stride * (Wo - 1) + 1),
            )[:, ::stride, :, ::stride]
            row.append(jnp.einsum("bhcw,bhow->co", sl, g))
        taps.append(jnp.stack(row))
    dw = jnp.stack(taps)                      # (k, k, C_in, C_out)
    db = jnp.sum(g, axis=(0, 1, 3))
    return dx, dw, db


small_conv2d.defvjp(_fwd, _bwd)
