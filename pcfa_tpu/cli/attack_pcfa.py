"""attack_PCFA CLI runner — per-image and universal PCFA.

Host-side orchestration around the jitted engines (`attack/pcfa.py`,
`attack/universal.py`): data loading, target construction, metric logging
with the reference vocabulary, artifact writing with the reference naming.
Mirrors `attack_PCFA.py:570-701` (per-image) and `:297-566` (universal).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from pcfa_tpu.attack.losses import default_mu
from pcfa_tpu.attack.pcfa import PCFAConfig, pcfa_attack
from pcfa_tpu.attack.universal import (
    UniversalConfig,
    universal_batch_attack,
    universal_init,
    unpack_deltas,
)
from pcfa_tpu import config
from pcfa_tpu.cli import common
from pcfa_tpu.cli.parsing import create_parser
from tqdm import tqdm as _tqdm
from pcfa_tpu.runtime import make_flow_fn_p
from pcfa_tpu.utils import tracking
from pcfa_tpu.utils.tracking import Tracker, save_flow, save_image, save_tensor


def resolve_mu(args) -> float:
    if args.mu == -1.0:
        mu = default_mu(args.delta_bound, args.target)
        print(
            "The optimizer penalty factor mu was choosen automatically to "
            "%d, because no value was provided via --mu.\n" % mu
        )
        return mu
    return args.mu


def _banner(args, mu, folder_path, universal):
    print("\nStarting Perturbation Constrained Flow Attack (PCFA):\n")
    print("\tModel:                   %s" % args.net)
    print("\tPerturbation universal:  %s" % universal)
    print("\tPerturbation joint:      %s" % args.joint_perturbation)
    print("\tPerturbation bound:      %f" % args.delta_bound)
    print()
    print("\tTarget:                  %s" % args.target)
    print("\tOptimizer steps:         %d" % args.steps)
    print("\tOptimizer boxconstraint: %s"
          % ("clipping" if universal else args.boxconstraint))
    print("\tOptimizer mu:            %f" % mu)
    print()
    print("\tOutputfolder:            %s\n" % folder_path)


def _log_setup_params(tracker, args, mu, batch_size, epochs):
    tracker.log_params(
        outputfolder=tracker.folder_path,
        model=args.net,
        dataset=args.dataset,
        dataset_stage=args.dataset_stage,
        dstype=args.dstype,
        dataset_batchsize=batch_size,
        dataset_epochs=epochs,
        attack="PCFA",
        attack_loss=args.loss,
        attack_target=args.target,
        attack_joint=args.joint_perturbation,
        attack_universal=args.universal_perturbation,
        box_eps=1e-7,
        pcfa_delta_bound=args.delta_bound,
        optimizer="LBFGS",
        optimizer_mu=args.mu,
        optimizer_resolved_mu=mu,
        optimizer_boxconstraint=(
            "clipping" if args.universal_perturbation else args.boxconstraint
        ),
        optimizer_steps=args.steps,
    )


def attack_l2(args) -> dict:
    """Per-image (disjoint/joint) PCFA over a dataset (`attack_PCFA.py:570`)."""
    common.setup_runtime()
    mu = resolve_mu(args)
    tracker = Tracker(args.output_folder, args.net, "PCFA",
                      args.joint_perturbation, False)
    _banner(args, mu, tracker.folder_path, universal=False)

    cfg = PCFAConfig(
        steps=args.steps,
        delta_bound=args.delta_bound,
        mu=mu,
        loss=args.loss,
        target=args.target,
        boxconstraint=args.boxconstraint,
        joint_perturbation=args.joint_perturbation,
        lbfgs_direction=config.lbfgs_direction(),
        lbfgs_history_dtype=config.lbfgs_history_dtype(args.net),
    )

    # per-image attacks are embarrassingly parallel: with multiple devices,
    # run one pair per device via the batch-sharded vmap (parallel/dp.py)
    n_dev = len(jax.devices())
    pair_chunk = n_dev * max(1, args.pairs_per_device)
    if pair_chunk > 1:
        print(f"Running {pair_chunk} per-image attacks in parallel "
              f"({max(1, args.pairs_per_device)} per device × {n_dev} "
              "devices)\n")
    loader, has_gt = common.make_loader(args, batch_size=pair_chunk)
    loaded = common.load_attack_model(args)

    attack_jit = None
    sums = {k: 0.0 for k in (
        "aee_gt", "aee_tgt", "aee_gt_tgt", "aee_adv_gt", "aee_adv_tgt",
        "aee_adv_pred", "l2_delta12", "aee_adv_tgt_min", "aee_adv_pred_min",
        "l2_delta12_min",
    )}
    tests = 0

    with tracker:
        _log_setup_params(tracker, args, mu, 1, 1)
        patches = tracking.create_subfolder(tracker.folder_path, "patches")

        for batch, (img1, img2, flow_gt, _valid) in enumerate(_tqdm(loader)):
            x1, x2 = common.unit_images(img1, img2)
            n_actual = x1.shape[0]
            if n_actual < pair_chunk:
                # ragged tail: pad by repeating the last pair; log/save only
                # the real ones. Exact-tail mode pads just to the next
                # multiple of the device count and lets jit compile a
                # second, right-sized executable — the default on CPU,
                # where compiles are cheap. On the tunneled TPU a second
                # ~20-min compile costs far more than attacking a few
                # duplicates, so there we pad to the full chunk unless
                # PCFA_TAIL_EXACT=1 overrides.
                exact_env = os.environ.get("PCFA_TAIL_EXACT")
                exact = (jax.default_backend() == "cpu"
                         if exact_env is None else exact_env == "1")
                tail = (-(-n_actual // n_dev) * n_dev if exact
                        else pair_chunk)
                reps = tail - n_actual
                if reps:
                    x1 = jnp.concatenate([x1] + [x1[-1:]] * reps)
                    x2 = jnp.concatenate([x2] + [x2[-1:]] * reps)
                    flow_gt = np.concatenate(
                        [flow_gt] + [flow_gt[-1:]] * reps)
            if attack_jit is None:
                padder, flow_fn_p = make_flow_fn_p(
                    loaded, x1.shape[1:3], common.pad_mode_for(args.dataset)
                )
                # params as jit ARGUMENTS (closures embed the weights into
                # the compile payload — fatal for FlowNet2's 650 MB)
                flow_init_fn = jax.jit(flow_fn_p)
                if pair_chunk > 1:
                    from pcfa_tpu.parallel import data_mesh, make_pcfa_attack_dp

                    mesh = data_mesh()
                    attack_jit = make_pcfa_attack_dp(
                        flow_fn_p, cfg, mesh, with_params=True
                    )
                else:
                    attack_jit = jax.jit(
                        lambda prm, a, b, t: pcfa_attack(
                            functools.partial(flow_fn_p, prm), a, b, t, cfg
                        )
                    )
            [p1], [p2] = padder.pad(x1), padder.pad(x2)

            flow_pred_init = flow_init_fn(loaded.params, p1, p2)
            target = common.build_target(args, flow_pred_init)
            res = attack_jit(loaded.params, p1, p2, target)
            m_all = jax.device_get(res.metrics)

            for i in range(n_actual):
                pair = batch * pair_chunk + i
                if pair_chunk > 1:
                    m = jax.tree.map(lambda a: a[i], m_all)
                    res_i = jax.tree.map(
                        lambda a: np.asarray(a[i : i + 1]), res
                    )
                else:
                    m = m_all
                    res_i = jax.tree.map(np.asarray, res)
                p1_i, p2_i = p1[i : i + 1], p2[i : i + 1]
                tgt_i = target[i : i + 1]
                fpi_i = flow_pred_init[i : i + 1]
                gt_i = flow_gt[i : i + 1]

                curr = pair * args.steps
                aee_tgt = common.epe(tgt_i, fpi_i)
                aee_gt_tgt = common.epe(tgt_i, gt_i) if has_gt else None
                aee_gt = common.epe(fpi_i, gt_i) if has_gt else None
                tracker.log_metrics(curr, ("aee_pred-tgt", aee_tgt),
                                    ("aee_gt-tgt", aee_gt_tgt),
                                    ("aee_pred-gt", aee_gt))
                tracker.log_metric("optim_mu", mu, curr)

                for st in range(args.steps):
                    cs = pair * args.steps + st
                    tracker.log_metrics(
                        cs,
                        ("batch", pair), ("steps", st), ("epoch", 0),
                        ("aee_predadv-tgt", m.aee_adv_tgt[st]),
                        ("aee_pred-predadv", m.aee_adv_pred[st]),
                        ("l2_delta1", m.l2_delta1[st]),
                        ("l2_delta2", m.l2_delta2[st]),
                        ("l2_delta-avg", m.l2_delta12[st]),
                        ("aee_pred-tgt_min", m.aee_adv_tgt_min[st]),
                        ("l2_delta-avg_min", m.l2_delta12_min[st]),
                        ("aee_pred-predadv_min", m.aee_adv_pred_min[st]),
                    )
                aee_adv_gt = (
                    common.epe(res_i.flow_pred, gt_i) if has_gt else None
                )
                if has_gt:
                    tracker.log_metric("aee_predadv-gt", aee_adv_gt,
                                       (pair + 1) * args.steps - 1)

                if common.should_save(pair, args):
                    reg = not args.unregistered_artifacts
                    kw = dict(tracker=tracker, register=reg)
                    save_tensor(res_i.delta1, "delta1_final", pair, patches, **kw)
                    save_tensor(res_i.delta2, "delta2_final", pair, patches, **kw)
                    save_tensor(res_i.delta1_best, "delta1_best", pair, patches, **kw)
                    save_tensor(res_i.delta2_best, "delta2_best", pair, patches, **kw)
                    save_tensor(p1_i, "image1", pair, patches, **kw)
                    save_tensor(p2_i, "image2", pair, patches, **kw)
                    save_tensor(tgt_i, "target", pair, patches, **kw)
                    save_tensor(res_i.flow_pred, "flow_pred_final", pair, patches, **kw)
                    save_tensor(res_i.flow_pred_best, "flow_pred_best", pair, patches, **kw)
                    save_tensor(res_i.flow_pred_init, "flow_pred_init", pair, patches, **kw)
                    if has_gt:
                        save_tensor(gt_i, "flow_gt", pair, patches, **kw)

                    save_image(p1_i, pair, patches, image_name="image1", **kw)
                    save_image(p2_i, pair, patches, image_name="image2", **kw)
                    save_image(np.asarray(p1_i) + res_i.delta1_best,
                               pair, patches, image_name="image1_delta_best", **kw)
                    save_image(np.asarray(p2_i) + res_i.delta2_best,
                               pair, patches, image_name="image2_delta_best", **kw)
                    max_delta = max(
                        float(np.abs(res_i.delta1_best).max()),
                        float(np.abs(res_i.delta2_best).max()),
                    )
                    save_image(res_i.delta1_best, pair, patches,
                               image_name="delta1_best",
                               normalize_max=max_delta or None, **kw)
                    if not args.joint_perturbation:
                        save_image(res_i.delta2_best, pair, patches,
                                   image_name="delta2_best",
                                   normalize_max=max_delta or None, **kw)
                    mf = tracking.max_flow_length(
                        gt_i if has_gt else None,
                        res_i.flow_pred_init, res_i.flow_pred_best,
                    )
                    fkw = dict(auto_scale=False, max_scale=mf, **kw)
                    save_flow(res_i.flow_pred_best, pair, patches,
                              flow_name="flow_pred_best", **fkw)
                    save_flow(res_i.flow_pred_init, pair, patches,
                              flow_name="flow_pred_init", **fkw)
                    save_flow(tgt_i, pair, patches, flow_name="flow_target", **fkw)
                    if has_gt:
                        save_flow(gt_i, pair, patches, flow_name="flow_gt", **fkw)

                last = args.steps - 1
                sums["aee_tgt"] += aee_tgt
                sums["aee_adv_tgt"] += float(m.aee_adv_tgt[last])
                sums["aee_adv_pred"] += float(m.aee_adv_pred[last])
                sums["l2_delta12"] += float(m.l2_delta12[last])
                sums["aee_adv_tgt_min"] += float(m.aee_adv_tgt_min[last])
                sums["aee_adv_pred_min"] += float(m.aee_adv_pred_min[last])
                sums["l2_delta12_min"] += float(m.l2_delta12_min[last])
                if has_gt:
                    sums["aee_gt"] += aee_gt
                    sums["aee_gt_tgt"] += aee_gt_tgt
                    sums["aee_adv_gt"] += aee_adv_gt
                tests += 1

        averages = tracker.log_averages(
            tests,
            ("aee_avg_pred-gt", sums["aee_gt"] if has_gt else None),
            ("aee_avg_pred-tgt", sums["aee_tgt"]),
            ("aee_avg_gt-tgt", sums["aee_gt_tgt"] if has_gt else None),
            ("aee_avg_predadv-gt", sums["aee_adv_gt"] if has_gt else None),
            ("aee_avg_predadv-tgt", sums["aee_adv_tgt"]),
            ("aee_avg_pred-predadv", sums["aee_adv_pred"]),
            ("l2_avg_delta12", sums["l2_delta12"]),
            ("aee_avg_predadv-tgt_min", sums["aee_adv_tgt_min"]),
            ("aee_avg_pred-predadv_min", sums["aee_adv_pred_min"]),
            ("l2_avg_delta12_min", sums["l2_delta12_min"]),
        )

    print("\nFinished attacking with PCFA. The best achieved values are")
    print("\tAEE(f_adv, f_init)=%f" % (sums["aee_adv_pred_min"] / tests))
    print("\tAEE(f_adv, f_targ)=%f" % (sums["aee_adv_tgt_min"] / tests))
    print("\tL2(perturbation)  =%f" % (sums["l2_delta12_min"] / tests))
    print()
    return averages


def attack_l2_universal(args) -> dict:
    """Universal-δ trainer (`attack_PCFA.py:297-566`)."""
    common.setup_runtime()
    mu = resolve_mu(args)
    tracker = Tracker(args.output_folder, args.net, "PCFA",
                      args.joint_perturbation, True)
    _banner(args, mu, tracker.folder_path, universal=True)

    cfg = UniversalConfig(
        steps=args.steps,
        delta_bound=args.delta_bound,
        mu=mu,
        loss=args.loss,
        joint_perturbation=args.joint_perturbation,
        lbfgs_direction=config.lbfgs_direction(),
        lbfgs_history_dtype=config.lbfgs_history_dtype(args.net),
    )

    loader, has_gt = common.make_loader(
        args, batch_size=args.batch_size, shuffle=True
    )
    loaded = common.load_attack_model(args)

    step_jit = None
    opt_state = None
    batch_ctr = -1

    with tracker:
        _log_setup_params(tracker, args, mu, args.batch_size, args.epochs)
        patches = tracking.create_subfolder(tracker.folder_path, "patches")
        reg = not args.unregistered_artifacts
        kw = dict(tracker=tracker, register=reg)

        for epoch in range(args.epochs):
            print("epoch: %d" % epoch)
            epoch_ran = False
            for batch, (img1, img2, flow_gt, _valid) in enumerate(_tqdm(loader)):
                batch_ctr += 1
                x1, x2 = common.unit_images(img1, img2)
                if step_jit is None:
                    padder, flow_fn_p = make_flow_fn_p(
                        loaded, x1.shape[1:3],
                        common.pad_mode_for(args.dataset),
                    )
                    flow_init_fn = jax.jit(flow_fn_p)
                    opt_state = universal_init(
                        padder.padded_shape + (3,), cfg
                    )
                    if getattr(args, "resume_from", None):
                        # warm-start δ from a per-epoch snapshot
                        # (SURVEY.md §5 checkpoint/resume)
                        from pcfa_tpu.cli.evaluate_pcfa import load_delta_nhwc

                        d1_init = load_delta_nhwc(args.resume_from)
                        if cfg.joint_perturbation:
                            x0 = jnp.asarray(d1_init).ravel()
                        else:
                            d2_path = args.resume_from.replace(
                                "delta1", "delta2"
                            )
                            d2_init = load_delta_nhwc(d2_path)
                            x0 = jnp.concatenate([
                                jnp.asarray(d1_init).ravel(),
                                jnp.asarray(d2_init).ravel(),
                            ])
                        opt_state = opt_state._replace(x=x0)
                        print("Resumed universal delta from %s"
                              % args.resume_from)
                    n_dev = len(jax.devices())
                    n_proc = jax.process_count()
                    n_local = len(jax.local_devices())
                    if (n_dev > 1 and args.batch_size % n_local == 0):
                        # batch-shard over the device mesh; δ-grad psum over
                        # ICI (and DCN across hosts — the loader already
                        # yields this host's dataset slice, so the global
                        # batch is batch_size × process_count)
                        from pcfa_tpu.parallel import (
                            data_mesh,
                            universal_batch_attack_dp,
                        )

                        if n_proc > 1:
                            from pcfa_tpu.parallel.multihost import (
                                global_batch,
                                global_data_mesh,
                            )

                            mesh = global_data_mesh()
                        else:
                            mesh, global_batch = data_mesh(), None
                        print(f"Sharding universal training over {n_dev} "
                              f"devices / {n_proc} host(s) (axis 'data')")
                        step_jit = functools.partial(
                            universal_batch_attack_dp, flow_fn_p,
                            config=cfg, mesh=mesh, params=loaded.params,
                        )
                    else:
                        global_batch = None
                        _ustep = jax.jit(
                            lambda prm, a, b, t, o: universal_batch_attack(
                                functools.partial(flow_fn_p, prm),
                                a, b, t, o, cfg,
                            ),
                            donate_argnums=(4,),  # opt_state buffers
                        )

                        def step_jit(a, b, t, o):
                            return _ustep(loaded.params, a, b, t, o)
                [p1], [p2] = padder.pad(x1), padder.pad(x2)
                # drop ragged last batches: δ optimizer state is shaped for
                # full batches and XLA wants static shapes
                if p1.shape[0] != args.batch_size:
                    continue

                flow_pred_init = flow_init_fn(loaded.params, p1, p2)
                target = common.build_target(args, flow_pred_init)

                curr = batch_ctr * args.steps
                aee_tgt = common.epe(target, flow_pred_init)
                tracker.log_metrics(
                    curr,
                    ("aee_pred-tgt", aee_tgt),
                    ("aee_gt-tgt",
                     common.epe(target, flow_gt) if has_gt else None),
                    ("aee_pred-gt",
                     common.epe(flow_pred_init, flow_gt) if has_gt else None),
                )

                if global_batch is not None:
                    # multi-host: assemble this host's batch into globally
                    # sharded arrays; δ/metrics come back replicated, the
                    # flow shards are gathered host-locally for artifacts
                    p1_g, p2_g, target_g = global_batch(mesh, p1, p2, target)
                    opt_state, metrics, _, flow_pred = step_jit(
                        p1_g, p2_g, target_g, opt_state
                    )
                    shards = sorted(flow_pred.addressable_shards,
                                    key=lambda s: s.index[0].start or 0)
                    flow_pred = jnp.asarray(np.concatenate(
                        [np.asarray(s.data) for s in shards]))
                else:
                    opt_state, metrics, _, flow_pred = step_jit(
                        p1, p2, target, opt_state
                    )
                epoch_ran = True
                m = jax.device_get(metrics)
                for s in range(args.steps):
                    cs = batch_ctr * args.steps + s
                    tracker.log_metrics(
                        cs,
                        ("steps", s), ("batch", batch), ("epoch", epoch),
                        ("aee_predadv-tgt", m.aee_adv_tgt[s]),
                        ("aee_pred-predadv", m.aee_adv_pred[s]),
                        ("l2_delta1", m.l2_delta1[s]),
                        ("l2_delta2", m.l2_delta2[s]),
                        ("l2_delta-avg", m.l2_delta12[s]),
                    )
                if has_gt:
                    tracker.log_metric(
                        "aee_predadv-gt", common.epe(flow_pred, flow_gt),
                        (batch_ctr + 1) * args.steps - 1,
                    )

                d1, d2 = unpack_deltas(
                    opt_state.x, padder.padded_shape + (3,),
                    cfg.joint_perturbation,
                )
                if common.should_save(batch_ctr, args):
                    save_tensor(d1, f"delta1_b{batch_ctr}", batch_ctr,
                                patches, **kw)
                    save_tensor(d2, f"delta2_b{batch_ctr}", batch_ctr,
                                patches, **kw)

            # ---- per-epoch artifacts (`attack_PCFA.py:524-560`) -----------
            if not epoch_ran:
                # every batch this epoch was dropped by the ragged-batch
                # guard above → d1/d2/p1/… are unbound; nothing to save
                raise ValueError(
                    f"no full batch of size {args.batch_size} in the "
                    f"dataset — reduce --batch_size (ragged batches are "
                    f"dropped: the universal δ optimizer state is shaped "
                    f"for full batches)"
                )
            save_tensor(d1, f"delta1_e{epoch}", batch_ctr, patches, **kw)
            max_delta = max(float(jnp.abs(d1).max()), float(jnp.abs(d2).max()))
            save_image(d1, batch_ctr, patches, image_name=f"delta1_e{epoch}",
                       normalize_max=max_delta or None, **kw)
            if not args.joint_perturbation:
                save_tensor(d2, f"delta2_e{epoch}", batch_ctr, patches, **kw)
                save_image(d2, batch_ctr, patches,
                           image_name=f"delta2_e{epoch}",
                           normalize_max=max_delta or None, **kw)
            save_image(np.asarray(p1) + np.asarray(d1)[None], batch_ctr,
                       patches, image_name=f"image1_delta_e{epoch}", **kw)
            save_image(np.asarray(p2) + np.asarray(d2)[None], batch_ctr,
                       patches, image_name=f"image2_delta_e{epoch}", **kw)
            mf = tracking.max_flow_length(
                flow_gt if has_gt else None, flow_pred_init, flow_pred
            )
            save_flow(flow_pred, batch_ctr, patches,
                      flow_name=f"flow_pred_e{epoch}",
                      auto_scale=False, max_scale=mf, **kw)
            if epoch == 0:
                save_tensor(p1, "image1_e0", batch, patches, **kw)
                save_tensor(p2, "image2_e0", batch, patches, **kw)
                save_tensor(target, "target_e0", batch, patches, **kw)
                save_tensor(flow_pred, "flow_pred_e0", batch, patches, **kw)
                save_tensor(flow_pred_init, "flow_pred_init_e0", batch,
                            patches, **kw)
                if has_gt:
                    save_tensor(flow_gt, "flow_gt_e0", batch, patches, **kw)
                save_image(p1, batch, patches, image_name="image1", **kw)
                save_image(p2, batch, patches, image_name="image2", **kw)
                save_flow(target, batch, patches, flow_name="flow_target",
                          auto_scale=False, max_scale=mf, **kw)
                save_flow(flow_pred_init, batch, patches,
                          flow_name="flow_pred_init",
                          auto_scale=False, max_scale=mf, **kw)
                if has_gt:
                    save_flow(flow_gt, batch, patches, flow_name="flow_gt",
                              auto_scale=False, max_scale=mf, **kw)

    print(
        "\nFinished attacking with PCFA, universal perturbations have been "
        "produced and are logged at\n%s" % tracker.folder_path
    )
    print(
        "To evaluate: python3 evaluate_PCFA.py --net=%s --origin_net=%s "
        "--dataset=%s --dataset_stage=%s --perturbation_sourcefolder=%s "
        "--dstype=%s --universal_perturbation --boxconstraint=clipping %s\n"
        % (args.net, args.net, args.dataset, args.dataset_stage,
           tracker.folder_path, args.dstype,
           "--joint_perturbation" if args.joint_perturbation else "")
    )
    return {"folder_path": tracker.folder_path}


def main(argv=None):
    parser = create_parser(stage="training", attack_type="pcfa")
    args = parser.parse_args(argv)
    print(args)
    if args.universal_perturbation:
        return attack_l2_universal(args)
    return attack_l2(args)


if __name__ == "__main__":
    main()
