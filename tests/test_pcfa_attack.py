"""End-to-end PCFA attack integration tests (SURVEY.md §4 item 3).

Tiny SpyNet + synthetic image pair; assert the attack pushes the prediction
toward the target while respecting the L2 bound — the reference's only
verification mechanism, now automated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcfa_tpu.attack.pcfa import PCFAConfig, pcfa_attack
from pcfa_tpu.data.synthetic import SyntheticDataset
from pcfa_tpu.models import make_model


NLEVELS = 3
H, W = 32, 48


@pytest.fixture(scope="module")
def spynet_fn():
    model, _ = make_model("SpyNet", nlevels=NLEVELS)
    x = jnp.zeros((1, H, W, 3))
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]

    def flow_fn(x1, x2):
        return model.apply({"params": params}, x1, x2)

    return flow_fn


@pytest.fixture(scope="module")
def image_pair():
    ds = SyntheticDataset(num_samples=1, size=(H, W), max_shift=2, seed=3)
    img1, img2, _, _ = ds[0]
    return (
        jnp.asarray(img1[None] / 255.0, jnp.float32),
        jnp.asarray(img2[None] / 255.0, jnp.float32),
    )


def _run(flow_fn, image_pair, **cfg_kwargs):
    cfg = PCFAConfig(steps=3, max_iter=5, delta_bound=0.02, **cfg_kwargs)
    x1, x2 = image_pair
    target = jnp.zeros_like(flow_fn(x1, x2))
    run = jax.jit(
        lambda a, b, t: pcfa_attack(flow_fn, a, b, t, cfg), backend="cpu"
    )
    return cfg, run(x1, x2, target)


@pytest.mark.parametrize("boxconstraint", ["clipping", "change_of_variables"])
def test_pcfa_disjoint_improves_and_bounds(spynet_fn, image_pair, boxconstraint):
    cfg, res = _run(spynet_fn, image_pair, boxconstraint=boxconstraint)
    m = res.metrics
    aee0 = float(jnp.sqrt(jnp.sum(res.flow_pred_init**2, -1)).mean())
    # attack moved prediction toward zero-flow target
    assert float(m.aee_adv_tgt_min[-1]) < aee0
    # once a step lands under the bound (latch), the aee-to-target minimum
    # is non-increasing (`attack_PCFA.py:233-239`)
    l2 = np.asarray(m.l2_delta12)
    aee_min = np.asarray(m.aee_adv_tgt_min)
    below = np.where(l2 <= cfg.delta_bound)[0]
    if below.size > 1:
        post = aee_min[below[0]:]
        assert np.all(np.diff(post) <= 1e-12)
    # metrics have the right trajectory shape
    assert m.aee_adv_tgt.shape == (cfg.steps,)
    # final deltas are finite
    assert np.isfinite(np.asarray(res.delta1)).all()
    assert np.isfinite(np.asarray(res.delta2)).all()


def test_pcfa_joint_single_delta(spynet_fn, image_pair):
    cfg, res = _run(spynet_fn, image_pair, joint_perturbation=True)
    # joint mode: both reported deltas are the same double-clamped field
    np.testing.assert_allclose(
        np.asarray(res.delta1), np.asarray(res.delta2), rtol=0, atol=0
    )
    aee0 = float(jnp.sqrt(jnp.sum(res.flow_pred_init**2, -1)).mean())
    assert float(res.metrics.aee_adv_tgt_min[-1]) < aee0


def test_joint_cov_rejected():
    with pytest.raises(ValueError):
        PCFAConfig(joint_perturbation=True, boxconstraint="change_of_variables")


def test_best_delta_under_bound_when_latched(spynet_fn, image_pair):
    """If any step lands under the bound, the reported best must stay under."""
    cfg, res = _run(spynet_fn, image_pair)
    m = res.metrics
    ever_below = bool(np.any(np.asarray(m.l2_delta12) <= cfg.delta_bound))
    if ever_below:
        assert float(m.l2_delta12_min[-1]) <= cfg.delta_bound + 1e-7


def test_fgsm_step_semantics(spynet_fn, image_pair):
    """I-FGSM unit semantics (`attack_FGSM.py:21-56`): targeted descent,
    clipping to [0,1], joint mode averages the two gradients."""
    from pcfa_tpu.attack.fgsm import FGSMConfig, fgsm_attack

    x1, x2 = image_pair
    target = jnp.zeros_like(spynet_fn(x1, x2))
    eps = 0.01

    res = jax.jit(lambda a, b, t: fgsm_attack(
        spynet_fn, a, b, t, FGSMConfig(steps=1, epsilon=eps)
    ))(x1, x2, target)
    d1 = np.asarray(res.delta1)
    # one step: delta is -eps*sign(grad) clipped into [0,1]-x; magnitudes
    # never exceed eps
    assert np.abs(d1).max() <= eps + 1e-6
    assert (np.abs(np.abs(d1[np.abs(d1) > 1e-8]) - eps) < 1e-4).mean() > 0.5

    resj = jax.jit(lambda a, b, t: fgsm_attack(
        spynet_fn, a, b, t,
        FGSMConfig(steps=1, epsilon=eps, joint_perturbation=True)
    ))(x1, x2, target)
    # joint: both images get the SAME sign pattern (averaged grad)
    s1 = np.sign(np.asarray(resj.delta1))
    s2 = np.sign(np.asarray(resj.delta2))
    inner = (np.abs(np.asarray(resj.delta1)) > 1e-8) & (
        np.abs(np.asarray(resj.delta2)) > 1e-8)
    assert (s1[inner] == s2[inner]).all()


def test_universal_engine_semantics(spynet_fn, image_pair):
    """Universal engine unit checks: δ broadcast over the batch, state
    persists across calls, metrics improve toward the target."""
    from pcfa_tpu.attack.universal import (
        UniversalConfig,
        universal_batch_attack,
        universal_init,
        unpack_deltas,
    )

    x1, x2 = image_pair
    batch1 = jnp.concatenate([x1, x2])  # 2 'pairs' from the two frames
    batch2 = jnp.concatenate([x2, x1])
    target = jnp.zeros((2, H, W, 2), jnp.float32)
    cfg = UniversalConfig(steps=2, max_iter=3, delta_bound=0.02, mu=1000.0)

    opt = universal_init((H, W, 3), cfg)
    assert opt.x.shape == (2 * H * W * 3,)  # disjoint: δ1 and δ2

    step = jax.jit(lambda a, b, t, o: universal_batch_attack(
        spynet_fn, a, b, t, o, cfg))
    opt1, m1, _, _ = step(batch1, batch2, target, opt)
    opt2, m2, _, _ = step(batch2, batch1, target, opt1)  # state persists
    assert float(m2.aee_adv_tgt[-1]) < float(m1.aee_adv_tgt[0])
    d1, d2 = unpack_deltas(opt2.x, (H, W, 3), False)
    assert d1.shape == (H, W, 3) and np.isfinite(np.asarray(d1)).all()
    # joint mode shares one δ
    cfgj = UniversalConfig(steps=1, max_iter=2, joint_perturbation=True)
    optj = universal_init((H, W, 3), cfgj)
    assert optj.x.shape == (H * W * 3,)
    ja, jb = unpack_deltas(optj.x, (H, W, 3), True)
    assert ja is jb
