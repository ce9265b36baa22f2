"""Flow-estimator zoo: Flax models + ModelSpec registry + weight converters.

Equivalent of the reference's `import_and_load` (`ownutilities.py:64-169`)
with declarative per-net contracts instead of scattered special cases.
"""

from __future__ import annotations

from pcfa_tpu.models.spec import ModelSpec, available_models, get_spec, register
from pcfa_tpu.models import convert
from pcfa_tpu.models.flownet2 import FlowNet2
from pcfa_tpu.models.gma import GMA
from pcfa_tpu.models.pwcnet import PWCDCNet
from pcfa_tpu.models.raft import RAFT
from pcfa_tpu.models.raft_small import RAFTSmall
from pcfa_tpu.models.spynet import SpyNet

register(
    ModelSpec(
        name="SpyNet",
        pad_divisor=64,
        make=SpyNet,
        convert=convert.spynet_params_from_files,
        defaults={"nlevels": 6},
    )
)

register(
    ModelSpec(
        name="FlowNet2",
        pad_divisor=64,
        make=FlowNet2,
        convert=convert.flownet2_params_from_checkpoint,
    )
)

register(
    ModelSpec(
        name="GMA",
        pad_divisor=8,
        iters=6,  # the adapter calls GMA with iters=6 (`ownutilities.py:327`)
        make=GMA,
        convert=convert.gma_params_from_checkpoint,
        defaults={"iters": 6},
    )
)

register(
    ModelSpec(
        name="PWCNet",
        pad_divisor=64,
        make=PWCDCNet,
        convert=convert.pwcnet_params_from_checkpoint,
    )
)

register(
    ModelSpec(
        name="RAFT",
        pad_divisor=8,
        iters=12,  # `raft.py:86` default, used by the adapter
        make=RAFT,
        convert=convert.raft_params_from_checkpoint,
        defaults={"iters": 12},
    )
)


register(
    ModelSpec(
        name="RAFT-small",
        pad_divisor=8,
        iters=12,
        make=RAFTSmall,
        convert=convert.raft_small_params_from_checkpoint,
        defaults={"iters": 12},
    )
)


def make_model(name: str, **overrides):
    """Construct the Flax module for `name` (no weights).

    Returns (module, spec)."""
    spec = get_spec(name)
    kwargs = dict(spec.defaults)
    kwargs.update(overrides)
    return spec.make(**kwargs), spec
