"""Attack losses vs the reference torch formulas (`helper_functions/losses.py`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcfa_tpu.attack import losses

torch = pytest.importorskip("torch")


def _ref_avg_epe(f1, f2):
    d = (torch.from_numpy(f1) - torch.from_numpy(f2)) ** 2
    return torch.mean(torch.sum(d, dim=-1).sqrt()).item()


def test_avg_epe_matches_reference(rng):
    f1 = rng.standard_normal((2, 8, 6, 2)).astype(np.float32)
    f2 = rng.standard_normal((2, 8, 6, 2)).astype(np.float32)
    ours = float(losses.avg_epe(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(ours, _ref_avg_epe(f1, f2), rtol=1e-6)


def test_avg_epe_unbatched(rng):
    f1 = rng.standard_normal((8, 6, 2)).astype(np.float32)
    f2 = rng.standard_normal((8, 6, 2)).astype(np.float32)
    ours = float(losses.avg_epe(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(ours, _ref_avg_epe(f1, f2), rtol=1e-6)


def test_mse_matches_reference(rng):
    f1 = rng.standard_normal((2, 8, 6, 2)).astype(np.float32)
    f2 = rng.standard_normal((2, 8, 6, 2)).astype(np.float32)
    ref = torch.mean((torch.from_numpy(f1) - torch.from_numpy(f2)) ** 2).item()
    np.testing.assert_allclose(
        float(losses.avg_mse(jnp.asarray(f1), jnp.asarray(f2))), ref, rtol=1e-6
    )


def test_two_norm_avg_matches_reference(rng):
    x = rng.standard_normal((3, 5, 7)).astype(np.float32)
    ref = (
        torch.sqrt(torch.sum(torch.pow(torch.flatten(torch.from_numpy(x)), 2)))
        / x.size**0.5
    ).item()
    np.testing.assert_allclose(float(losses.two_norm_avg(jnp.asarray(x))), ref, rtol=1e-6)


def test_two_norm_avg_delta(rng):
    d1 = rng.standard_normal((3, 4, 4)).astype(np.float32)
    d2 = rng.standard_normal((3, 4, 4)).astype(np.float32)
    # losses.py:91-107
    ref = np.sqrt((d1**2).sum() + (d2**2).sum()) / np.sqrt(d1.size + d2.size)
    np.testing.assert_allclose(
        float(losses.two_norm_avg_delta(jnp.asarray(d1), jnp.asarray(d2))),
        ref,
        rtol=1e-6,
    )


def test_relu_penalty_zero_inside_bound():
    d = jnp.full((3, 4, 4), 1e-4)
    assert float(losses.relu_penalty(d, d, delta_bound=0.01)) == 0.0


def test_relu_penalty_active_outside_bound():
    d = jnp.full((3, 4, 4), 0.1)
    val = float(losses.relu_penalty(d, d, delta_bound=0.01))
    np.testing.assert_allclose(val, 0.1**2 - 0.01**2, rtol=1e-5)


def test_loss_delta_constraint_composition(rng):
    pred = jnp.asarray(rng.standard_normal((1, 6, 6, 2)).astype(np.float32))
    tgt = jnp.zeros_like(pred)
    d = jnp.full((1, 6, 6, 3), 0.05, dtype=jnp.float32)
    total = losses.loss_delta_constraint(pred, tgt, d, d, delta_bound=0.01, mu=10.0)
    expected = losses.avg_epe(pred, tgt) + 10.0 * losses.relu_penalty(d, d, 0.01)
    np.testing.assert_allclose(float(total), float(expected), rtol=1e-6)


def test_cosim_correct_formula(rng):
    p = rng.standard_normal((4, 4, 2)).astype(np.float32)
    ours = float(losses.f_cosim(jnp.asarray(p), jnp.asarray(p)))
    np.testing.assert_allclose(ours, 0.0, atol=1e-6)  # identical fields → 1 - 1 = 0


def test_default_mu():
    assert losses.default_mu(0.005, "zero") == 2500.0 / 0.005
    assert losses.default_mu(0.005, "neg_flow") == 1.5 * 2500.0 / 0.005
