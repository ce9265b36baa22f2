"""Attack engines: PCFA (per-image / universal), I-FGSM, and their parts."""

from pcfa_tpu.attack.boxconstraint import (
    cov_forward,
    cov_inverse,
    extract_deltas,
    extract_deltas_joint,
)
from pcfa_tpu.attack.fgsm import FGSMConfig, fgsm_attack
from pcfa_tpu.attack.lbfgs import LBFGSState, lbfgs_init, lbfgs_iteration, lbfgs_run
from pcfa_tpu.attack.losses import (
    avg_epe,
    avg_mse,
    default_mu,
    f_cosim,
    get_loss,
    loss_delta_constraint,
    relu_penalty,
    two_norm_avg,
    two_norm_avg_delta,
    two_norm_avg_delta_squared,
)
from pcfa_tpu.attack.pcfa import (
    PCFAConfig,
    PCFAResult,
    pcfa_attack,
    pcfa_init,
    pcfa_outer_step,
)
from pcfa_tpu.attack.targets import make_target_fn, neg_flow, zero_flow
from pcfa_tpu.attack.universal import (
    UniversalConfig,
    universal_batch_attack,
    universal_init,
)
