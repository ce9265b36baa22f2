#!/usr/bin/env python3
"""Speed-of-light decomposition of the RAFT attack closure (VERDICT r4 #7).

Pure host-side arithmetic — no device needed. Models each stage of the
bench closure (v5e, bf16, batch=2 pairs, 376×1248, 12 iterations) as
matmul tile-pass counts + HBM byte streams and prints, per stage:

  true    ms — analytic FLOPs / 197 TFLOPs (bf16 peak): the unreachable
               dense-FLOP bound.
  padded  ms — FLOPs after padding every matmul dim to 128-lane tiles
               (what the MXU actually executes for THIS formulation).
  bytes   ms — dominant HBM streams / 819 GB/s.
  floor   ms — max(padded, bytes): the stage's speed of light in its
               current formulation.
  meas    ms — the slope-timed stage rows (profile_base2/profile_chain,
               BASELINE.md rounds 3-5).

Backward convention: the attack differentiates w.r.t. the INPUT images
only, so conv backward = dx alone (dw is DCE'd — BASELINE.md round 3);
fwd+bwd conv cost = fwd + transpose-conv ≈ 2× fwd in both FLOPs and
passes. Matmul-stage backward = 3× fwd (two operand grads).

Provenance of measured rows: encoders/volume/iteration/upsample from
profile_base2.py at round-3 HEAD (the round-4/5 changes did not touch
these stages), lookup from profile_lookup_forms.py after the rf-lookup
(round 3), closure total re-derived from the round-4 bench
(0.056111 pairs/s, batch=2, 220 closure-equivalents/pair → 162 ms).
"""

from __future__ import annotations

import math

PEAK = 197e12  # v5e bf16 dense peak FLOPs/s
BW = 819e9     # v5e HBM bytes/s
TILE = 128

B = 2                       # pairs vmapped per chip (bench optimum)
H, W = 376, 1248
H8, W8 = H // 8, W // 8     # 47, 156
N = H8 * W8                 # 7332 queries / feature positions per image
ITERS = 12
P = 9                       # 2·radius+1 lookup window


def tiles(x: int) -> int:
    return -(-x // TILE)


def mm(mname, M, K, Nc, mult=1.0):
    """One matmul: returns (true_flops, padded_flops)."""
    t = 2.0 * M * K * Nc * mult
    p = 2.0 * M * tiles(K) * TILE * tiles(Nc) * TILE * mult
    return t, p


def conv(Hs, Ws, cin, k, cout, mult=1.0):
    """Conv as implicit matmul M=B·Hs·Ws, K=cin·k², N=cout."""
    return mm("conv", B * Hs * Ws, cin * k * k, cout, mult)


def ms_f(f):
    return f / PEAK * 1e3


def ms_b(by):
    return by / BW * 1e3


def stage(name, mms, extra_bytes=0.0, meas=None, note=""):
    t = sum(x[0] for x in mms)
    p = sum(x[1] for x in mms)
    fl = max(ms_f(p), ms_b(extra_bytes))
    print(f"{name:26s} true {ms_f(t):6.2f}  padded {ms_f(p):6.2f}  "
          f"bytes {ms_b(extra_bytes):6.2f}  floor {fl:6.2f}  "
          f"meas {meas if meas is not None else '  n/a'}"
          + (f"   {note}" if note else ""))
    return fl


print(f"# RAFT closure SOL model: v5e bf16, batch={B} pairs, {H}x{W}, "
      f"{ITERS} iters")
print(f"# peak {PEAK/1e12:.0f} TFLOPs/s, HBM {BW/1e9:.0f} GB/s\n")

# --- encoders: 6 frames (4 fnet + 2 cnet per closure at batch=2) --------
FR = 3  # frames per pair: 2 fnet + 1 cnet
H2, W2 = H // 2, W // 2
H4, W4 = H // 4, W // 4
enc = []
enc.append(conv(H2, W2, 3, 7, 64, mult=FR))               # stem 7x7/2
for _ in range(4):
    enc.append(conv(H2, W2, 64, 3, 64, mult=FR))          # layer1: 2 blocks
enc.append(conv(H4, W4, 64, 3, 96, mult=FR))              # layer2_0 conv1/2
enc.append(conv(H4, W4, 96, 3, 96, mult=3 * FR))
enc.append(conv(H4, W4, 64, 1, 96, mult=FR))              # downsample
enc.append(conv(H8, W8, 96, 3, 128, mult=FR))             # layer3_0
enc.append(conv(H8, W8, 128, 3, 128, mult=3 * FR))
enc.append(conv(H8, W8, 96, 1, 128, mult=FR))
enc.append(conv(H8, W8, 128, 1, 256, mult=FR))            # conv2 (256 & 256)
enc = [(2 * t, 2 * p) for (t, p) in enc]                  # + dx backward
# bytes: activations fwd write + bwd read+write (instance norms re-stream)
act_bytes = 2 * (B * FR) * (H2 * W2 * 64 * 6 + H4 * W4 * 96 * 6
                            + H8 * W8 * 128 * 6 + H8 * W8 * 256) * 3
f_enc = stage("encoders (6 frames)", enc, act_bytes, 40.8,
              "stem/layer1 small-channel; meas incl norm streams")

# --- all-pairs volume + pooled pyramid ----------------------------------
vol = [mm("vol", N, 256, N, mult=B * 3)]                  # f1@f2ᵀ fwd+bwd
# pooled-f2 levels: f2 pooled then matmul per level (cols/4^l)
for lvl in (1, 2, 3):
    vol.append(mm("pool", N, 256, N // 4 ** lvl, mult=B * 3))
vol_bytes = 2 * B * (N * N * (1 + 0.25 + 0.0625 + 0.015625)) * 2  # wr+bwd rd
f_vol = stage("volume+pooled pyramid", vol, vol_bytes, 7.6)

# --- per-iteration lookup (separable matmuls, rf association) -----------
# per query & level: win = wy @ (cmap @ wxᵀ) (W2>128) or (wy@cmap)@wxᵀ.
# True FLOPs; padded = measured pass structure (round 3: level0 9
# passes/query fwd+bwd, one-tile levels 4) × 2·128³ per pass.
lk_true = 0.0
for lvl in range(4):
    h2l, w2l = max(H8 // 2 ** lvl, 1), max(W8 // 2 ** lvl, 1)
    lk_true += 3 * B * N * 2 * (P * h2l * w2l + P * P * w2l)
lk_pass = (9 + 4 + 4 + 4) * B * N * 2.0 * TILE ** 3
lk_bytes = 3 * B * (N * N * 1.328) * 2  # cmap stream fwd + bwd dcmap
f_lk = stage("lookup ×1 iter", [(lk_true, lk_pass)], lk_bytes, 6.2,
             "pass-bound: M=9 of 128 sublanes")

# --- per-iteration motion encoder + GRU + flow head ---------------------
it = []
it.append(conv(H8, W8, 4 * P * P, 1, 256))   # convc1 (324→256)
it.append(conv(H8, W8, 256, 3, 192))         # convc2
it.append(conv(H8, W8, 2, 7, 128))           # convf1
it.append(conv(H8, W8, 128, 3, 64))          # convf2
it.append(conv(H8, W8, 256, 3, 126))         # motion conv
for _ in range(6):                            # GRU: 3 gates × (1×5 + 5×1)
    it.append(mm("gru", B * N, 384 * 5, 128))
it.append(conv(H8, W8, 128, 3, 256))         # flow head 1
it.append(conv(H8, W8, 256, 3, 2))           # flow head 2
it = [(2 * t, 2 * p) for (t, p) in it]       # + dx
it_bytes = 2 * B * N * (384 + 256 + 192 + 128 * 4) * 2 * 3
f_it = stage("GRU/motion/head ×1 iter", it, it_bytes, 3.6,
             "meas = 9.8 iter slope − 6.2 lookup")

# --- convex upsample + attack glue --------------------------------------
up = [conv(H8, W8, 128, 3, 256), conv(H8, W8, 256, 1, 9 * 64),
      mm("convex", B * H * W * 2, 9, 1)]
up = [(2 * t, 2 * p) for (t, p) in up]
up_bytes = 2 * B * (H * W * 2 * 4 * 4 + H * W * 3 * 4 * 6)
f_up = stage("upsample + attack glue", up, up_bytes, 1.4 + 1.0)

total_floor = f_enc + f_vol + ITERS * (f_lk + f_it) + f_up
total_true = None
print(f"\ncomposite floor (this formulation): {total_floor:6.1f} ms")
print("measured closure (r4 bench):           162   ms  "
      f"→ {162 / total_floor:.2f}× above floor")

# idealized-alternative bound: lookup at its BYTE floor (any algorithm
# must stream the volume once fwd + once bwd per iteration)
ideal = f_enc + f_vol + ITERS * (ms_b(lk_bytes) + f_it) + f_up
print(f"idealized lookup (byte floor only):    {ideal:6.1f} ms  "
      "— every measured alternative formulation was slower "
      "(gather 33.6, per-query Pallas 14.2, hybrid, fused; BASELINE.md)")
