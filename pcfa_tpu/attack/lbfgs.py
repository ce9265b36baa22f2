"""Functional L-BFGS with torch `optim.LBFGS` semantics, scan-compatible.

PCFA drives a torch L-BFGS (`max_iter=10` per `.step(closure)`, 20 outer
steps, default lr=1, **no line search**) through the frozen flow network
(`attack_PCFA.py:97,114,175-192`). Unrolled, torch's step structure is a
*uniform* sequence of {evaluate loss+grad at x; compute direction; maybe
update x} iterations — each `.step()` ends with an un-evaluated update whose
gradient is computed by the next `.step()`'s entry closure call. This module
implements exactly that uniform iteration, so the whole 20×10 optimization
compiles to ONE `lax.scan` on TPU with zero host synchronization.

Semantics replicated from torch/optim/lbfgs.py (no-line-search path):
  * first-ever iteration: d = −g, t = min(1, 1/‖g‖₁)·lr; afterwards t = lr
  * history update with y = g − g_prev, s = t_prev·d_prev, pushed only when
    y·s > 1e-10; ring buffer of `history_size` (torch default 100)
  * two-loop recursion with H₀ = (y·s)/(y·y)·I
  * per-`.step()` break conditions, modeled as a `done` latch that resets at
    each segment boundary (`pos == 0`):
      - entry: max|g| ≤ tolerance_grad → whole segment is a no-op
      - pre-update: g·d > −tolerance_change
      - post-update: max|g_new| ≤ tol_grad, max|t·d| ≤ tol_change,
        |loss_new − loss_prev| < tol_change

The optimizer state lives on device; `value_and_grad_fn` is the closure
(one full forward+backward through the flow net per iteration).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class LBFGSState(NamedTuple):
    x: jnp.ndarray          # (n,) parameters
    d: jnp.ndarray          # (n,) last search direction
    t: jnp.ndarray          # () last step size
    prev_grad: jnp.ndarray  # (n,)
    prev_loss: jnp.ndarray  # ()
    y_buf: jnp.ndarray      # (m, n) gradient differences
    s_buf: jnp.ndarray      # (m, n) parameter steps
    ro_buf: jnp.ndarray     # (m,) 1/(y·s)
    h_diag: jnp.ndarray     # ()
    count: jnp.ndarray      # () int32 — total history pushes
    n_iter: jnp.ndarray     # () int32 — total iterations executed
    done: jnp.ndarray       # () bool — break latch for the current segment
    last_step_max: jnp.ndarray  # () max|t·d| of the last applied update
    gram_sy: jnp.ndarray    # (m, m) SᵀY in ring order (compact direction)
    gram_yy: jnp.ndarray    # (m, m) YᵀY in ring order (compact direction)


def lbfgs_init(x0: jnp.ndarray, history_size: int = 100,
               history_dtype: jnp.dtype | None = None) -> LBFGSState:
    """`history_dtype=bfloat16` stores the (m, n) curvature-pair ring
    buffers in bf16 — halves the optimizer's HBM footprint/streams (the
    dominant per-iteration cost at torch's m=100 and attack-scale n) at a
    ~0.4% relative rounding of the y/s pairs; iterates, gradients and all
    scalar state stay fp32."""
    n = x0.shape[0]
    hdtype = x0.dtype if history_dtype is None else history_dtype
    return LBFGSState(
        x=x0,
        # distinct buffers per field: aliased leaves break jit donation
        # ("attempt to donate the same buffer twice")
        d=jnp.zeros_like(x0),
        t=jnp.asarray(0.0, x0.dtype),
        prev_grad=jnp.zeros_like(x0),
        prev_loss=jnp.asarray(0.0, x0.dtype),
        y_buf=jnp.zeros((history_size, n), hdtype),
        s_buf=jnp.zeros((history_size, n), hdtype),
        ro_buf=jnp.zeros((history_size,), x0.dtype),
        h_diag=jnp.asarray(1.0, x0.dtype),
        count=jnp.asarray(0, jnp.int32),
        n_iter=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
        last_step_max=jnp.asarray(jnp.inf, x0.dtype),
        # Gram matrices of the history pairs, maintained incrementally (one
        # row+column per push) so the compact direction never has to re-read
        # the full (m, n) buffers to rebuild them. 80 KB at m=100 — free.
        gram_sy=jnp.zeros((history_size, history_size), x0.dtype),
        gram_yy=jnp.zeros((history_size, history_size), x0.dtype),
    )


def _two_loop(
    grad: jnp.ndarray,
    y_buf: jnp.ndarray,
    s_buf: jnp.ndarray,
    ro_buf: jnp.ndarray,
    h_diag: jnp.ndarray,
    count: jnp.ndarray,
) -> jnp.ndarray:
    """Two-loop recursion over a ring buffer of `count` valid entries.

    Loop bounds are the (traced) valid count: entries beyond it would
    contribute exactly zero, so skipping them is exact — and each loop trip
    streams two (m, n) buffer rows, which dominates the optimizer cost at
    torch's default history_size=100."""
    m = y_buf.shape[0]
    num_valid = jnp.minimum(count, m)

    q0 = -grad
    al0 = jnp.zeros((m,), grad.dtype)

    def backward(k, carry):
        q, al = carry
        i = jnp.mod(count - 1 - k, m)  # newest first
        a = ro_buf[i] * jnp.dot(s_buf[i], q)
        q = q - a * y_buf[i]
        return q, al.at[i].set(a)

    q, al = jax.lax.fori_loop(0, num_valid, backward, (q0, al0))
    d0 = q * h_diag

    def forward(k, d):
        i = jnp.mod(count - num_valid + k, m)  # oldest first
        be = ro_buf[i] * jnp.dot(y_buf[i], d)
        return d + s_buf[i] * (al[i] - be)

    return jax.lax.fori_loop(0, num_valid, forward, d0)


def _compact_direction(
    grad: jnp.ndarray,
    y_buf: jnp.ndarray,
    s_buf: jnp.ndarray,
    h_diag: jnp.ndarray,
    count: jnp.ndarray,
) -> jnp.ndarray:
    """MXU-friendly direction via the compact inverse-BFGS representation.

    Byrd–Nocedal–Schnabel (1994, Thm 2.2), with H0 = γI:

        H = γI + [S  γY] [[ R⁻ᵀ(D + γYᵀY)R⁻¹   −R⁻ᵀ ]  [ Sᵀ ]
                          [ −R⁻¹                 0   ]] [ γYᵀ ]

    where R = triu(SᵀY), D = diag(SᵀY), rows of S/Y ordered oldest→newest.
    Algebraically identical to the two-loop recursion, but the O(m) sequential
    ring-buffer walk (m HBM-latency-bound trips of two (n,) rows each) becomes
    two (m,n)@(n,m) Gram matmuls + four (m,n) matvec streams — MXU work at
    HBM speed-of-light, plus O(m²) triangular solves on tiny (m,m) operands.
    The (m,n) buffers stay in ring order; only (m,)/(m,m) operands are
    permuted to chronological order for the triangular structure.
    """
    f32 = grad.dtype
    # fp32 accumulation targets: the buffers may be stored in bf16
    gram_sy = jnp.dot(s_buf, y_buf.T, preferred_element_type=f32)  # SᵀY
    gram_yy = jnp.dot(y_buf, y_buf.T, preferred_element_type=f32)  # YᵀY
    sg = jnp.dot(s_buf, grad, preferred_element_type=f32)          # Sᵀg
    yg = jnp.dot(y_buf, grad, preferred_element_type=f32)          # Yᵀg
    return _compact_solve(grad, y_buf, s_buf, gram_sy, gram_yy, sg, yg,
                          h_diag, count)


def _compact_solve(
    grad: jnp.ndarray,
    y_buf: jnp.ndarray,
    s_buf: jnp.ndarray,
    gram_sy: jnp.ndarray,
    gram_yy: jnp.ndarray,
    sg: jnp.ndarray,
    yg: jnp.ndarray,
    h_diag: jnp.ndarray,
    count: jnp.ndarray,
) -> jnp.ndarray:
    """Compact-representation direction from precomputed history products.

    All inputs involving the (m, n) buffers — the Gram matrices SᵀY/YᵀY and
    the projections Sᵀg/Yᵀg — arrive precomputed (the iteration maintains the
    Grams incrementally and fuses the projections into one streaming pass per
    buffer), so this function touches the big buffers only in the final
    two-vector reconstruction: exactly two (m,)@(m,n) streams per call.
    """
    m = y_buf.shape[0]
    num_valid = jnp.minimum(count, m)
    start = jnp.where(count < m, 0, jnp.mod(count, m))
    ranks = jnp.arange(m, dtype=jnp.int32)
    perm = jnp.mod(start + ranks, m)      # chronological rank -> ring index
    valid = ranks < num_valid             # in rank space

    gamma = h_diag
    f32 = grad.dtype
    sy = gram_sy[perm][:, perm]
    yy = gram_yy[perm][:, perm]
    p1 = jnp.where(valid, sg[perm], 0.0)
    p2 = jnp.where(valid, yg[perm], 0.0)

    both = valid[:, None] & valid[None, :]
    r_mat = jnp.where(both & (ranks[:, None] <= ranks[None, :]), sy, 0.0)
    # unit diagonal on invalid ranks: solves act as identity there, and the
    # corresponding coefficients are zeroed below anyway
    r_mat = r_mat + jnp.diag(jnp.where(valid, 0.0, 1.0).astype(grad.dtype))
    d_diag = jnp.where(valid, jnp.diag(sy), 0.0)
    yy_m = jnp.where(both, yy, 0.0)

    q = jax.scipy.linalg.solve_triangular(r_mat, p1, lower=False)  # R⁻¹Sᵀg
    t_vec = d_diag * q + gamma * (yy_m @ q) - gamma * p2
    top = jax.scipy.linalg.solve_triangular(
        r_mat, t_vec, lower=False, trans="T"
    )
    top = jnp.where(valid, top, 0.0)
    bot = jnp.where(valid, -q, 0.0)

    # scatter tiny coefficient vectors back to ring order
    top_r = jnp.zeros((m,), grad.dtype).at[perm].set(top)
    bot_r = jnp.zeros((m,), grad.dtype).at[perm].set(bot)
    hg = gamma * grad \
        + jnp.dot(top_r, s_buf, preferred_element_type=f32) \
        + gamma * jnp.dot(bot_r, y_buf, preferred_element_type=f32)
    return -hg


def lbfgs_iteration(
    value_and_grad_fn: Callable[[jnp.ndarray], tuple[jnp.ndarray, jnp.ndarray]],
    state: LBFGSState,
    pos: jnp.ndarray,
    lr: float = 1.0,
    tolerance_grad: float = 1e-7,
    tolerance_change: float = 1e-9,
    direction: str = "two_loop",
) -> tuple[LBFGSState, jnp.ndarray]:
    """One uniform L-BFGS iteration; `pos` is the index within the current
    `.step()` segment (0..max_iter-1). Returns (new_state, loss-at-entry)."""
    m = state.y_buf.shape[0]
    loss, grad = value_and_grad_fn(state.x)

    at_entry = pos == 0
    done = jnp.where(at_entry, False, state.done)

    opt_cond = jnp.max(jnp.abs(grad)) <= tolerance_grad
    # break checks carried over from the previous iteration's post-update
    # state (torch checks them at the end of the prior loop trip):
    small_step = state.last_step_max <= tolerance_change
    flat_loss = jnp.abs(loss - state.prev_loss) < tolerance_change
    carried_break = jnp.where(
        at_entry, opt_cond, opt_cond | small_step | flat_loss
    )
    done = done | carried_break

    first = state.n_iter == 0

    # --- direction ---------------------------------------------------------
    y = grad - state.prev_grad
    s = state.d * state.t
    ys = jnp.dot(y, s)
    push = (~done) & (~first) & (ys > 1e-10)
    idx = jnp.mod(state.count, m)
    # Row-level writes (dynamic_update_slice) so XLA updates the ring buffer
    # in place under scan donation instead of copying the whole history.
    # (explicit casts: the ring buffers may be stored in bf16)
    hdt = state.y_buf.dtype
    y_buf = state.y_buf.at[idx].set(
        jnp.where(push, y.astype(hdt), state.y_buf[idx]))
    s_buf = state.s_buf.at[idx].set(
        jnp.where(push, s.astype(hdt), state.s_buf[idx]))
    ro_buf = state.ro_buf.at[idx].set(
        jnp.where(push, 1.0 / ys, state.ro_buf[idx])
    )
    count = jnp.where(push, state.count + 1, state.count)
    h_diag = jnp.where(push, ys / jnp.dot(y, y), state.h_diag)

    gram_sy, gram_yy = state.gram_sy, state.gram_yy
    if direction == "compact":
        # One fused streaming pass per (m, n) buffer computes EVERY product
        # the compact direction needs this iteration: the g-projections
        # (Sᵀg, Yᵀg) and the new Gram row/column (S·y_new, Y·y_new, Y·s_new).
        # The Gram matrices themselves are carried in the state and only the
        # pushed slot's row+column change — vs. rebuilding SᵀY/YᵀY from the
        # buffers (two full (m,n)@(n,m) re-reads) plus two separate matvec
        # passes every iteration. RHS columns are cast to the history dtype
        # so a bf16 history never silently promotes the big operand
        # (bf16-history mode already rounds y/s the same way; fp32 history
        # keeps this path exact).
        rhs = jnp.stack([grad, y, s], axis=1).astype(hdt)     # (n, 3)
        f32 = grad.dtype
        prods_s = jnp.dot(s_buf, rhs, preferred_element_type=f32)  # (m, 3)
        prods_y = jnp.dot(y_buf, rhs, preferred_element_type=f32)  # (m, 3)
        sg, yg = prods_s[:, 0], prods_y[:, 0]
        # gram_sy[i, j] = s_i·y_j → column idx = S@y_new, row idx = Y@s_new;
        # gram_yy is symmetric: row = column = Y@y_new.
        gram_sy = gram_sy.at[:, idx].set(
            jnp.where(push, prods_s[:, 1], gram_sy[:, idx]))
        gram_sy = gram_sy.at[idx, :].set(
            jnp.where(push, prods_y[:, 2], gram_sy[idx, :]))
        gram_yy = gram_yy.at[:, idx].set(
            jnp.where(push, prods_y[:, 1], gram_yy[:, idx]))
        gram_yy = gram_yy.at[idx, :].set(
            jnp.where(push, prods_y[:, 1], gram_yy[idx, :]))
        d_hist = _compact_solve(grad, y_buf, s_buf, gram_sy, gram_yy,
                                sg, yg, h_diag, count)
    else:
        d_hist = _two_loop(grad, y_buf, s_buf, ro_buf, h_diag, count)
    d = jnp.where(first, -grad, d_hist)
    t = jnp.where(
        first, jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(grad))) * lr, lr
    ).astype(state.x.dtype)

    gtd = jnp.dot(grad, d)
    pre_break = gtd > -tolerance_change

    apply = ~done & ~pre_break
    x_new = jnp.where(apply, state.x + t * d, state.x)
    last_step_max = jnp.where(apply, jnp.max(jnp.abs(t * d)), jnp.inf)

    def sel(new, old):
        return jnp.where(done, old, new)

    new_state = LBFGSState(
        x=x_new,
        d=sel(d, state.d),
        t=sel(t, state.t),
        prev_grad=sel(grad, state.prev_grad),
        prev_loss=sel(loss, state.prev_loss),
        y_buf=y_buf,  # pushes already gated on ~done
        s_buf=s_buf,
        ro_buf=ro_buf,
        h_diag=sel(h_diag, state.h_diag),
        count=sel(count, state.count),
        n_iter=sel(state.n_iter + 1, state.n_iter),
        done=done | pre_break,
        last_step_max=sel(last_step_max, state.last_step_max),
        gram_sy=gram_sy,  # updates already gated on push (~done)
        gram_yy=gram_yy,
    )
    return new_state, loss


def lbfgs_run(
    value_and_grad_fn,
    x0: jnp.ndarray,
    num_steps: int,
    max_iter: int = 10,
    history_size: int = 100,
    lr: float = 1.0,
    direction: str = "two_loop",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Convenience driver: `num_steps` torch-style `.step()` segments of
    `max_iter` iterations each, as one lax.scan. Returns (x_final, losses)."""
    state = lbfgs_init(x0, history_size)

    def body(state, j):
        pos = jnp.mod(j, max_iter)
        state, loss = lbfgs_iteration(value_and_grad_fn, state, pos, lr,
                                      direction=direction)
        return state, loss

    state, losses = jax.lax.scan(
        body, state, jnp.arange(num_steps * max_iter, dtype=jnp.int32)
    )
    return state.x, losses
