"""Data-parallel attack execution over a device mesh.

Two parallel modes (SURVEY.md §2.6 "TPU-native equivalents"):

* `pcfa_attack_dp` — N independent per-pair attacks, vmapped and
  batch-sharded over the 'data' axis. No collective is needed in the
  optimization (pairs are independent); XLA partitions the vmapped program
  so each device optimizes its own pairs.

* `universal_batch_attack_dp` — ONE shared δ trained on a batch sharded
  across devices. Built with `shard_map`: every device holds the replicated
  L-BFGS state and its local image shard; the objective computes local loss
  sums and `lax.psum`s them to the exact global-batch loss, so the grad of
  the similarity term is all-reduced over ICI while the δ-penalty (a pure
  function of the replicated δ) stays local. Every device then executes
  identical L-BFGS math → the replicated state stays bit-identical without
  further synchronization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from pcfa_tpu.attack.lbfgs import LBFGSState, lbfgs_iteration
from pcfa_tpu.attack.losses import get_loss, relu_penalty, two_norm_avg, two_norm_avg_delta
from pcfa_tpu.attack.pcfa import PCFAConfig, PCFAResult, pcfa_attack
from pcfa_tpu.attack.universal import UniversalConfig, UniversalMetrics, unpack_deltas


def make_pcfa_attack_dp(flow_fn, config: PCFAConfig, mesh: Mesh,
                        with_params: bool = False):
    """Build ONE jitted data-parallel attack callable (construct once, call
    per batch — each `jax.jit` wrapper carries its own trace/compile cache,
    so rebuilding it per call retraces every batch).

    Returns `attack(images1, images2, targets)` or, with `with_params=True`,
    `attack(params, images1, images2, targets)` where `flow_fn` is
    `flow_fn_p(params, x1, x2)` and params ride through the jit replicated
    (as arguments, not closures — closures embed weights into the compile
    payload)."""

    def single(flow, x1, x2, t):
        res = pcfa_attack(flow, x1[None], x2[None], t[None], config)
        # drop the singleton batch axis the engine adds on image-like
        # leaves (metric trajectories are (steps,) and keep their shape)
        return jax.tree.map(lambda a: a[0] if a.ndim == 4 else a, res)

    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    if not with_params:
        return jax.jit(
            jax.vmap(functools.partial(single, flow_fn)),
            in_shardings=(shard, shard, shard),
        )
    return jax.jit(
        jax.vmap(
            lambda prm, a, b, t: single(
                functools.partial(flow_fn, prm), a, b, t
            ),
            in_axes=(None, 0, 0, 0),
        ),
        in_shardings=(rep, shard, shard, shard),
    )


def pcfa_attack_dp(
    flow_fn,
    images1: jnp.ndarray,
    images2: jnp.ndarray,
    targets: jnp.ndarray,
    config: PCFAConfig,
    mesh: Mesh,
    params=None,
) -> PCFAResult:
    """Independent PCFA attacks on N pairs, sharded over mesh axis 'data'.

    images1/2: (N, H', W', 3) padded unit images; targets (N, H, W, 2).
    N must be divisible by the mesh size. Returns a PCFAResult whose leaves
    have a leading N axis. One-shot convenience over `make_pcfa_attack_dp`
    (repeated callers should build the jitted fn once via the maker)."""
    if params is None:
        return make_pcfa_attack_dp(flow_fn, config, mesh)(
            images1, images2, targets)
    return make_pcfa_attack_dp(flow_fn, config, mesh, with_params=True)(
        params, images1, images2, targets)


def universal_batch_attack_dp(
    flow_fn,
    images1: jnp.ndarray,
    images2: jnp.ndarray,
    target: jnp.ndarray,
    opt_state: LBFGSState,
    config: UniversalConfig,
    mesh: Mesh,
    params=None,
):
    """`universal_batch_attack` with the batch sharded over 'data'.

    Semantics identical to the serial version (the global-batch mean loss);
    the δ-gradient all-reduce is an explicit `lax.psum` — the system's one
    true collective (SURVEY.md §2.6).

    `params`: optional explicit model params; when given, `flow_fn` is
    treated as `flow_fn_p(params, x1, x2)` and the params ride through the
    jit as a replicated argument (closures would embed the weights into the
    compile payload — fatal for FlowNet2-sized models)."""
    cfg = config
    delta_shape = images1.shape[1:]
    if cfg.loss not in ("aee", "mse", "cosim"):
        raise NotImplementedError(
            f"sharded universal training: unknown loss {cfg.loss!r}"
        )

    use_params = params is not None

    def sharded_step(prm, x1_local, x2_local, tgt_local, opt):
        if use_params:
            def flow(a, b):
                return flow_fn(prm, a, b)
        else:
            flow = flow_fn
        n_dev = jax.lax.psum(1, "data")

        def local_objective(x):
            """Returns (value_for_grad, value_share).

            aee/mse — `value_for_grad` is this device's 1/n_dev share of the
            global objective. δ (x) enters REPLICATED and is promoted to
            device-varying where it meets the local images (pvary); the
            transpose of pvary is a psum, so shard_map's AD all-reduces the
            share gradients into the exact global δ-gradient. The penalty
            rides the same promotion (invariant + varying add), so its
            share must also carry 1/n_dev.

            cosim — a ratio of GLOBAL sums (dot, ‖pred‖², ‖target‖²; cf.
            losses.f_cosim, reference `losses.py:76-88`), psummed INSIDE
            the objective. That makes `value_for_grad` replication-invariant
            and the share convention wrong for AD: the sim path's gradient
            is already exact (psum transposes to per-device identity, then
            the pvary at px1/px2 psums the x-cotangent), and the penalty
            path never crosses the mesh, so its local gradient is already
            the global one. Differentiate the EXACT global value, undivided.

            `value_share` always psums to the global objective value."""
            d1, d2 = unpack_deltas(x, delta_shape, cfg.joint_perturbation)
            px1 = jnp.clip(x1_local + d1[None], 0.0, 1.0)
            px2 = jnp.clip(x2_local + d2[None], 0.0, 1.0)
            flow_out = flow(px1, px2)
            pen = cfg.mu * relu_penalty(d1, d2, cfg.delta_bound)
            if cfg.loss == "aee":
                sim_local = jnp.sum(
                    jnp.sqrt(jnp.sum((flow_out - tgt_local) ** 2, axis=-1))
                )
                n_local = (flow_out.shape[0] * flow_out.shape[1]
                           * flow_out.shape[2])
                share = sim_local / (n_local * n_dev) + pen / n_dev
                return share, share
            if cfg.loss == "mse":
                # mean over every element incl. the uv channel
                share = (jnp.sum((flow_out - tgt_local) ** 2)
                         / (flow_out.size * n_dev) + pen / n_dev)
                return share, share
            # cosim
            dot = jax.lax.psum(jnp.sum(flow_out * tgt_local), "data")
            np2 = jax.lax.psum(jnp.sum(flow_out * flow_out), "data")
            nt2 = jax.lax.psum(jnp.sum(tgt_local * tgt_local), "data")
            v = 1.0 - dot / (jnp.sqrt(np2) * jnp.sqrt(nt2)) + pen
            # 0·(varying) keeps the share device-varying so the value psum
            # below is well-typed; it carries no gradient
            return v, v / n_dev + 0.0 * jnp.sum(flow_out)

        def value_and_grad(x):
            (_, v_share), g = jax.value_and_grad(
                local_objective, has_aux=True)(x)
            return jax.lax.psum(v_share, "data"), g

        flow_pred_init_local = flow(x1_local, x2_local)

        def outer(opt, _):
            def inner(opt, pos):
                return lbfgs_iteration(value_and_grad, opt, pos, lr=cfg.lr,
                                       direction=cfg.lbfgs_direction)

            opt, seg_losses = jax.lax.scan(
                inner, opt, jnp.arange(cfg.max_iter, dtype=jnp.int32)
            )
            d1, d2 = unpack_deltas(opt.x, delta_shape, cfg.joint_perturbation)
            px1 = jnp.clip(x1_local + d1[None], 0.0, 1.0)
            px2 = jnp.clip(x2_local + d2[None], 0.0, 1.0)
            flow_out = flow(px1, px2)

            def gmean_epe(a, b):
                s = jnp.sum(jnp.sqrt(jnp.sum((a - b) ** 2, axis=-1)))
                n = a.shape[0] * a.shape[1] * a.shape[2]
                return jax.lax.psum(s, "data") / (n * jax.lax.psum(1, "data"))

            metrics = UniversalMetrics(
                loss=seg_losses[-1],
                aee_adv_tgt=gmean_epe(flow_out, tgt_local),
                aee_adv_pred=gmean_epe(flow_out, flow_pred_init_local),
                l2_delta1=two_norm_avg(d1),
                l2_delta2=two_norm_avg(d2),
                l2_delta12=two_norm_avg_delta(d1, d2),
            )
            return opt, (metrics, flow_out)

        opt, (metrics, flows) = jax.lax.scan(outer, opt, None,
                                             length=cfg.steps)
        return opt, metrics, flow_pred_init_local, flows[-1]

    data = P("data")
    rep = P()
    fn = shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(rep, data, data, data, rep),
        out_specs=(rep, rep, data, data),
    )
    return jax.jit(fn)(params if use_params else {}, images1, images2,
                       target, opt_state)
