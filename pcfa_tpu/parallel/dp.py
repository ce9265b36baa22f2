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
    have a leading N axis. `params`: optional explicit model params (then
    `flow_fn` is `flow_fn_p(params, x1, x2)`) — replicated across devices,
    passed as a jit argument, not a closure."""

    def single(flow, x1, x2, t):
        res = pcfa_attack(flow, x1[None], x2[None], t[None], config)
        # drop the singleton batch axis the engine adds on image-like
        # leaves (metric trajectories are (steps,) and keep their shape)
        return jax.tree.map(lambda a: a[0] if a.ndim == 4 else a, res)

    shard = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    if params is None:
        fn = jax.jit(
            jax.vmap(functools.partial(single, flow_fn)),
            in_shardings=(shard, shard, shard),
        )
        return fn(images1, images2, targets)

    fn = jax.jit(
        jax.vmap(
            lambda prm, a, b, t: single(
                functools.partial(flow_fn, prm), a, b, t
            ),
            in_axes=(None, 0, 0, 0),
        ),
        in_shardings=(rep, shard, shard, shard),
    )
    return fn(params, images1, images2, targets)


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
    if cfg.loss not in ("aee", "mse"):
        raise NotImplementedError(
            "sharded universal training supports the separable 'aee'/'mse' "
            "losses; use the serial engine for 'cosim' (globally normalized)"
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
            """This device's share of the global objective.

            Summed over devices this is exactly the serial objective:
            global-mean EPE + penalty. δ (x) is REPLICATED, and shard_map's
            AD all-reduces cotangents of replicated inputs automatically
            (the transpose of replication is a psum) — so the grad of this
            local share IS the global δ-gradient; only the loss value needs
            an explicit psum. The penalty is divided by the device count so
            the auto-psum counts it once."""
            d1, d2 = unpack_deltas(x, delta_shape, cfg.joint_perturbation)
            px1 = jnp.clip(x1_local + d1[None], 0.0, 1.0)
            px2 = jnp.clip(x2_local + d2[None], 0.0, 1.0)
            flow_out = flow(px1, px2)
            if cfg.loss == "aee":
                sim_local = jnp.sum(
                    jnp.sqrt(jnp.sum((flow_out - tgt_local) ** 2, axis=-1))
                )
                n_local = (flow_out.shape[0] * flow_out.shape[1]
                           * flow_out.shape[2])
            else:  # mse: mean over every element incl. the uv channel
                sim_local = jnp.sum((flow_out - tgt_local) ** 2)
                n_local = flow_out.size
            sim_share = sim_local / (n_local * n_dev)
            pen_share = cfg.mu * relu_penalty(d1, d2, cfg.delta_bound) / n_dev
            return sim_share + pen_share

        def value_and_grad(x):
            v_loc, g = jax.value_and_grad(local_objective)(x)
            return jax.lax.psum(v_loc, "data"), g

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
