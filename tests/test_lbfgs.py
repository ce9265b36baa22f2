"""Functional L-BFGS vs torch.optim.LBFGS trajectory parity.

The attack replays torch's exact optimizer semantics (`attack_PCFA.py:97,192`)
as a lax.scan; these tests check full-trajectory agreement on problems with
analytic closures, including the ring-buffer history path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcfa_tpu.attack import lbfgs

torch = pytest.importorskip("torch")


def _torch_trajectory(f_torch, x0, num_steps, max_iter, history_size, lr=1.0):
    x = torch.from_numpy(x0.copy()).requires_grad_(True)
    opt = torch.optim.LBFGS(
        [x], lr=lr, max_iter=max_iter, history_size=history_size
    )
    traj = []

    def closure():
        opt.zero_grad()
        loss = f_torch(x)
        loss.backward()
        return loss

    for _ in range(num_steps):
        opt.step(closure)
        traj.append(x.detach().numpy().copy())
    return traj


def _jax_trajectory(f_jax, x0, num_steps, max_iter, history_size, lr=1.0):
    vag = jax.value_and_grad(f_jax)
    state = lbfgs.lbfgs_init(jnp.asarray(x0), history_size)
    traj = []
    for _ in range(num_steps):
        for pos in range(max_iter):
            state, _ = lbfgs.lbfgs_iteration(vag, state, jnp.asarray(pos), lr)
        traj.append(np.asarray(state.x))
    return traj


def _compare(f_torch, f_jax, x0, num_steps, max_iter, history_size, atol, lr=1.0):
    ref = _torch_trajectory(f_torch, x0, num_steps, max_iter, history_size, lr)
    ours = _jax_trajectory(f_jax, x0, num_steps, max_iter, history_size, lr)
    for step, (r, o) in enumerate(zip(ref, ours)):
        np.testing.assert_allclose(o, r, atol=atol, err_msg=f"outer step {step}")


def test_quadratic_matches_torch(rng):
    n = 20
    A = rng.standard_normal((n, n)).astype(np.float32)
    Q = A @ A.T + 5.0 * np.eye(n, dtype=np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    x0 = rng.standard_normal(n).astype(np.float32)

    tQ, tb = torch.from_numpy(Q), torch.from_numpy(b)
    jQ, jb = jnp.asarray(Q), jnp.asarray(b)
    _compare(
        lambda x: 0.5 * x @ tQ @ x - tb @ x,
        lambda x: 0.5 * x @ jQ @ x - jb @ x,
        x0,
        num_steps=3,
        max_iter=10,
        history_size=100,
        atol=2e-4,
    )


def test_small_history_ring_buffer(rng):
    """history_size < total iterations exercises the pop-oldest path."""
    n = 12
    A = rng.standard_normal((n, n)).astype(np.float32)
    Q = A @ A.T + 3.0 * np.eye(n, dtype=np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    x0 = 2.0 * rng.standard_normal(n).astype(np.float32)

    tQ, tb = torch.from_numpy(Q), torch.from_numpy(b)
    jQ, jb = jnp.asarray(Q), jnp.asarray(b)
    _compare(
        lambda x: 0.5 * x @ tQ @ x - tb @ x,
        lambda x: 0.5 * x @ jQ @ x - jb @ x,
        x0,
        num_steps=4,
        max_iter=5,
        history_size=3,
        atol=5e-4,
    )


def test_nonconvex_matches_torch(rng):
    """Rosenbrock-style nonconvex objective, several segments."""
    x0 = np.array([-1.2, 1.0, 0.5, -0.7], dtype=np.float32)

    def f_torch(x):
        return torch.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    def f_jax(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)

    ref = _torch_trajectory(f_torch, x0, 3, 10, 100)
    ours = _jax_trajectory(f_jax, x0, 3, 10, 100)
    # Nonconvex + f32: check loss-level agreement (trajectories can drift at
    # machine precision) and first-step exactness.
    np.testing.assert_allclose(ours[0], ref[0], atol=1e-3)
    for r, o in zip(ref, ours):
        np.testing.assert_allclose(
            float(f_jax(jnp.asarray(o))), float(f_torch(torch.from_numpy(r))),
            rtol=0.05, atol=1e-4,
        )


def test_converged_point_is_fixed(rng):
    """At an optimum the tolerance breaks freeze the state (no NaNs/drift)."""
    Q = jnp.eye(4)

    def f(x):
        return 0.5 * x @ Q @ x

    x_final, losses = lbfgs.lbfgs_run(
        jax.value_and_grad(f), jnp.ones(4), num_steps=6, max_iter=10
    )
    assert np.all(np.isfinite(np.asarray(losses)))
    np.testing.assert_allclose(np.asarray(x_final), 0.0, atol=1e-6)


@pytest.mark.parametrize("history_size,max_iter,num_steps", [
    (100, 10, 3),   # partial fill (count < m)
    (7, 5, 6),      # wrapped ring buffer (count > m)
])
def test_compact_direction_matches_two_loop(rng, history_size, max_iter,
                                            num_steps):
    """Byrd–Nocedal–Schnabel compact form == two-loop recursion, including
    partially-filled and wrapped ring buffers."""
    n = 16
    A = rng.standard_normal((n, n)).astype(np.float32)
    Q = jnp.asarray(A @ A.T + 4.0 * np.eye(n, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x0 = rng.standard_normal(n).astype(np.float32)

    def f(x):
        return 0.5 * x @ Q @ x - b @ x

    vag = jax.value_and_grad(f)
    st_tl = lbfgs.lbfgs_init(jnp.asarray(x0), history_size)
    st_cp = lbfgs.lbfgs_init(jnp.asarray(x0), history_size)
    for _ in range(num_steps):
        for pos in range(max_iter):
            st_tl, _ = lbfgs.lbfgs_iteration(vag, st_tl, jnp.asarray(pos))
            st_cp, _ = lbfgs.lbfgs_iteration(vag, st_cp, jnp.asarray(pos),
                                             direction="compact")
            # per-iteration direction agreement (before fp drift compounds)
            np.testing.assert_allclose(
                np.asarray(st_cp.d), np.asarray(st_tl.d),
                rtol=2e-3, atol=1e-5,
            )
            st_cp = st_cp._replace(x=st_tl.x, d=st_tl.d,
                                   prev_grad=st_tl.prev_grad,
                                   y_buf=st_tl.y_buf, s_buf=st_tl.s_buf)


def test_compact_matches_torch(rng):
    """Full-trajectory torch parity also holds with the compact direction."""
    n = 20
    A = rng.standard_normal((n, n)).astype(np.float32)
    Q = A @ A.T + 5.0 * np.eye(n, dtype=np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    x0 = rng.standard_normal(n).astype(np.float32)

    tQ, tb = torch.from_numpy(Q), torch.from_numpy(b)
    jQ, jb = jnp.asarray(Q), jnp.asarray(b)
    ref = _torch_trajectory(lambda x: 0.5 * x @ tQ @ x - tb @ x, x0, 3, 10, 100)

    vag = jax.value_and_grad(lambda x: 0.5 * x @ jQ @ x - jb @ x)
    state = lbfgs.lbfgs_init(jnp.asarray(x0), 100)
    for step in range(3):
        for pos in range(10):
            state, _ = lbfgs.lbfgs_iteration(vag, state, jnp.asarray(pos),
                                             direction="compact")
        np.testing.assert_allclose(np.asarray(state.x), ref[step], atol=5e-4,
                                   err_msg=f"outer step {step}")


def test_bf16_history_converges(rng):
    """bf16 curvature-pair storage still optimizes the quadratic to (near)
    the fp32 solution — the knob halves the attack's optimizer HBM."""
    n = 16
    A = rng.standard_normal((n, n)).astype(np.float32)
    Q = jnp.asarray(A @ A.T + 4.0 * np.eye(n, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x_opt = jnp.linalg.solve(Q, b)

    def f(x):
        return 0.5 * x @ Q @ x - b @ x

    vag = jax.value_and_grad(f)
    for direction in ("two_loop", "compact"):
        state = lbfgs.lbfgs_init(x0, 10, jnp.bfloat16)
        for step in range(4):
            for pos in range(5):
                state, _ = lbfgs.lbfgs_iteration(vag, state,
                                                 jnp.asarray(pos),
                                                 direction=direction)
        assert state.y_buf.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(state.x), np.asarray(x_opt),
                                   rtol=2e-2, atol=2e-3,
                                   err_msg=direction)


def test_scan_run_matches_python_loop(rng):
    n = 10
    A = rng.standard_normal((n, n)).astype(np.float32)
    Q = jnp.asarray(A @ A.T + 4.0 * np.eye(n, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x0 = rng.standard_normal(n).astype(np.float32)

    def f(x):
        return 0.5 * x @ Q @ x - b @ x

    x_scan, _ = lbfgs.lbfgs_run(jax.value_and_grad(f), jnp.asarray(x0), 2, 10, 50)
    x_loop = _jax_trajectory(f, x0, 2, 10, 50)[-1]
    np.testing.assert_allclose(np.asarray(x_scan), x_loop, atol=1e-5)
