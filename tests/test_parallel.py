"""Sharded attack paths on the virtual 8-device CPU mesh (SURVEY.md §4.4).

The DP universal trainer must produce the same δ trajectory as the serial
engine — the psum'd global-batch loss is mathematically identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pcfa_tpu.attack.pcfa import PCFAConfig
from pcfa_tpu.attack.universal import (
    UniversalConfig,
    universal_batch_attack,
    universal_init,
)
from pcfa_tpu.data.synthetic import SyntheticDataset
from pcfa_tpu.models import make_model
from pcfa_tpu.parallel import data_mesh, pcfa_attack_dp, universal_batch_attack_dp

H, W = 32, 32
NDEV = 4


@pytest.fixture(scope="module")
def flow_fn():
    model, _ = make_model("SpyNet", nlevels=3)
    x = jnp.zeros((1, H, W, 3))
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]
    return lambda a, b: model.apply({"params": params}, a, b)


@pytest.fixture(scope="module")
def batch():
    ds = SyntheticDataset(num_samples=NDEV, size=(H, W), max_shift=2)
    arrs = [ds[i] for i in range(NDEV)]
    x1 = jnp.asarray(np.stack([a[0] for a in arrs]) / 255.0, jnp.float32)
    x2 = jnp.asarray(np.stack([a[1] for a in arrs]) / 255.0, jnp.float32)
    return x1, x2


def test_universal_dp_matches_serial(flow_fn, batch):
    x1, x2 = batch
    target = jnp.zeros((NDEV, H, W, 2), jnp.float32)
    cfg = UniversalConfig(steps=2, max_iter=3, delta_bound=0.01, mu=1000.0)
    mesh = data_mesh(NDEV)

    opt0 = universal_init((H, W, 3), cfg)
    opt_s, m_s, _, _ = jax.jit(
        lambda a, b, t, o: universal_batch_attack(flow_fn, a, b, t, o, cfg)
    )(x1, x2, target, opt0)
    opt_p, m_p, init_p, flow_p = universal_batch_attack_dp(
        flow_fn, x1, x2, target, opt0, cfg, mesh
    )

    # psum reordering reassociates float sums; differences amplify through
    # the L-BFGS iterations but stay at noise level (atol covers the worst
    # observed drift — 8.4e-5 on |x|≈3e-4 elements after the windowed-gather
    # sampler changed the warp's summation order)
    np.testing.assert_allclose(
        np.asarray(opt_s.x), np.asarray(opt_p.x), rtol=1e-2, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(m_s.aee_adv_tgt), np.asarray(m_p.aee_adv_tgt),
        rtol=1e-3, atol=1e-5,
    )
    assert init_p.shape == (NDEV, H, W, 2)


def test_pcfa_dp_runs_sharded(flow_fn, batch):
    x1, x2 = batch
    targets = jnp.zeros((NDEV, H, W, 2), jnp.float32)
    cfg = PCFAConfig(steps=1, max_iter=2, delta_bound=0.01,
                     boxconstraint="clipping")
    mesh = data_mesh(NDEV)
    res = pcfa_attack_dp(flow_fn, x1, x2, targets, cfg, mesh)
    assert res.delta1.shape == (NDEV, H, W, 3)
    assert res.metrics.aee_adv_tgt.shape == (NDEV, cfg.steps)
    assert np.isfinite(np.asarray(res.delta1)).all()

    # sharded result == unsharded vmap result
    from pcfa_tpu.attack.pcfa import pcfa_attack

    res1 = jax.jit(jax.vmap(
        lambda a, b, t: jax.tree.map(
            lambda z: z[0] if z.ndim == 4 else z,
            pcfa_attack(flow_fn, a[None], b[None], t[None], cfg),
        )
    ))(x1, x2, targets)
    np.testing.assert_allclose(
        np.asarray(res.delta1), np.asarray(res1.delta1), rtol=1e-2, atol=2e-4
    )


def test_universal_dp_mse_matches_serial(flow_fn, batch):
    x1, x2 = batch
    target = jnp.zeros((NDEV, H, W, 2), jnp.float32)
    cfg = UniversalConfig(steps=1, max_iter=3, delta_bound=0.01, mu=1000.0,
                          loss="mse")
    mesh = data_mesh(NDEV)
    opt0 = universal_init((H, W, 3), cfg)
    opt_s, m_s, _, _ = jax.jit(
        lambda a, b, t, o: universal_batch_attack(flow_fn, a, b, t, o, cfg)
    )(x1, x2, target, opt0)
    opt_p, m_p, _, _ = universal_batch_attack_dp(
        flow_fn, x1, x2, target, opt0, cfg, mesh
    )
    np.testing.assert_allclose(
        np.asarray(opt_s.x), np.asarray(opt_p.x), rtol=1e-2, atol=5e-5
    )


@pytest.mark.parametrize("model_name", ["RAFT", "GMA"])
def test_spatial_sharded_raft_matches_serial(model_name):
    """Volume-sharded RAFT / volume+attention-sharded GMA (rows over a
    'space' mesh axis) reproduce the serial model's flow AND input
    gradients — the properties the PCFA engine relies on (SURVEY.md §2.6
    spatial sharding / CP analog)."""
    from pcfa_tpu.models.gma import GMA
    from pcfa_tpu.models.raft import RAFT
    from pcfa_tpu.parallel.sp import space_mesh, spatial_flow_fn

    cls = {"RAFT": RAFT, "GMA": GMA}[model_name]
    n_dev = 8
    # corr_levels=2 keeps the coarsest pyramid level >= 2x2 at 64 px while
    # exercising the identical sharding/collective structure cheaply
    Hs = Ws = 64
    serial = cls(iters=2, corr_levels=2)
    x = jnp.zeros((1, Hs, Ws, 3), jnp.float32)
    params = serial.init(jax.random.PRNGKey(0), x, x)["params"]

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.random((1, Hs, Ws, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, Hs, Ws, 3)), jnp.float32)

    flow_ref = serial.apply({"params": params}, x1, x2)[1]

    mesh = space_mesh(n_dev)
    sharded = cls(iters=2, corr_levels=2, spatial_axis="space",
                  spatial_shards=n_dev)
    flow_fn = spatial_flow_fn(sharded, params, mesh)
    flow_sp = jax.jit(flow_fn)(x1, x2)
    np.testing.assert_allclose(
        np.asarray(flow_sp), np.asarray(flow_ref), rtol=1e-4, atol=1e-4
    )

    def loss_ref(a, b):
        return jnp.mean(serial.apply({"params": params}, a, b)[1] ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x1, x2)
    g_sp = jax.grad(
        lambda a, b: jnp.mean(flow_fn(a, b) ** 2), argnums=(0, 1)
    )(x1, x2)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        )


def test_spatial_sharding_composes_with_fused_corr():
    """Row-sharding + the volume-free fused lookup together: each device
    rebuilds corr rows only for its query rows against the replicated
    pooled f2 features — flow matches the serial fused model."""
    from pcfa_tpu.models.raft import RAFT
    from pcfa_tpu.parallel.sp import space_mesh, spatial_flow_fn

    n_dev = 8
    Hs = Ws = 64
    serial = RAFT(iters=2, corr_levels=2, corr_impl="fused", corr_block=50)
    x = jnp.zeros((1, Hs, Ws, 3), jnp.float32)
    params = RAFT(iters=2, corr_levels=2).init(
        jax.random.PRNGKey(0), x, x)["params"]

    rng = np.random.default_rng(1)
    x1 = jnp.asarray(rng.random((1, Hs, Ws, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, Hs, Ws, 3)), jnp.float32)
    flow_ref = serial.apply({"params": params}, x1, x2)[1]

    sharded = RAFT(iters=2, corr_levels=2, corr_impl="fused", corr_block=50,
                   spatial_axis="space", spatial_shards=n_dev)
    flow_sp = jax.jit(spatial_flow_fn(sharded, params, space_mesh(n_dev)))(
        x1, x2)
    np.testing.assert_allclose(
        np.asarray(flow_sp), np.asarray(flow_ref), rtol=1e-4, atol=1e-4
    )


def test_pcfa_engine_composes_with_spatial_flow():
    """The attack engine runs unchanged on a spatially-sharded flow_fn —
    L-BFGS differentiates through the shard_map'd volume/lookup."""
    from pcfa_tpu.attack.pcfa import pcfa_attack
    from pcfa_tpu.models.raft import RAFT
    from pcfa_tpu.parallel.sp import space_mesh, spatial_flow_fn

    n_dev = 8
    Hs = Ws = 64
    model = RAFT(iters=1, corr_levels=2, spatial_axis="space",
                 spatial_shards=n_dev)
    x = jnp.zeros((1, Hs, Ws, 3), jnp.float32)
    params = RAFT(iters=1, corr_levels=2).init(
        jax.random.PRNGKey(0), x, x)["params"]
    flow_fn = spatial_flow_fn(model, params, space_mesh(n_dev))

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.random((1, Hs, Ws, 3)), jnp.float32)
    x2 = jnp.asarray(rng.random((1, Hs, Ws, 3)), jnp.float32)
    target = jnp.zeros((1, Hs, Ws, 2), jnp.float32)
    cfg = PCFAConfig(steps=1, max_iter=2, delta_bound=0.01)

    res = jax.jit(
        lambda a, b, t: pcfa_attack(flow_fn, a, b, t, cfg)
    )(x1, x2, target)
    assert np.isfinite(np.asarray(res.delta1)).all()
    assert np.isfinite(float(res.metrics.loss[-1]))
    assert float(res.metrics.l2_delta12[-1]) > 0.0


def test_universal_dp_cosim_matches_serial(flow_fn, batch):
    """cosim is a ratio of GLOBAL sums; the sharded path decomposes it into
    three psums (dot, ‖pred‖², ‖target‖²) whose trajectory must match the
    serial engine (reference losses.py:76-88 semantics, corrected form)."""
    x1, x2 = batch
    # non-zero target: cosim's gradient vanishes identically at target=0
    rng = np.random.default_rng(3)
    target = jnp.asarray(rng.normal(size=(NDEV, H, W, 2)), jnp.float32)
    cfg = UniversalConfig(steps=1, max_iter=3, delta_bound=0.01, mu=1000.0,
                          loss="cosim")
    mesh = data_mesh(NDEV)
    opt0 = universal_init((H, W, 3), cfg)
    opt_s, m_s, _, _ = jax.jit(
        lambda a, b, t, o: universal_batch_attack(flow_fn, a, b, t, o, cfg)
    )(x1, x2, target, opt0)
    opt_p, m_p, _, _ = universal_batch_attack_dp(
        flow_fn, x1, x2, target, opt0, cfg, mesh
    )
    np.testing.assert_allclose(
        np.asarray(opt_s.x), np.asarray(opt_p.x), rtol=1e-2, atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(m_s.loss), np.asarray(m_p.loss), rtol=1e-3, atol=1e-6
    )
