"""pcfa_tpu — TPU-native Perturbation-Constrained Flow Attack framework.

A ground-up JAX/Flax/Pallas rebuild of the capabilities of cv-stuttgart/PCFA
(Schmalfuss, Scholze, Bruhn — ECCV 2022): adversarial perturbation attacks on
optical-flow networks (SpyNet, PWCNet, RAFT, GMA, FlowNet2), with L-BFGS
penalty-method optimization differentiating through the frozen flow network,
compiled to a single jitted `lax.scan` on TPU.

Layout:
    io/        flow-file IO (.flo / KITTI .png / .npy / .pfm) and image IO
    data/      dataset indexers (Sintel, KITTI15), synthetic data, prefetch loader
    models/    Flax flow estimators + PyTorch-checkpoint converters
    ops/       shared differentiable primitives (warp, correlation) + Pallas kernels
    attack/    PCFA / FGSM attack engines, L-BFGS, losses, targets, box constraints
    parallel/  device-mesh sharding (data-parallel attacks, universal-δ psum)
    metrics/   flow error measures (AAE / AEE / BP / Fl)
    viz/       flow color-coding and error plots
    utils/     padding, tracking (MLflow/JSONL), timing
    cli/       attack_pcfa / attack_fgsm / evaluate_pcfa entry points
"""

__version__ = "0.1.0"
