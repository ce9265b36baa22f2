"""Model registry: declarative per-network contracts.

The reference scatters per-net special cases through `ownutilities.py`
(`preprocess_img` `:241-280`, `compute_flow` `:302-343`,
`model_takes_unit_input` `:347-360`). The rebuild inverts that: every flow
estimator registers a `ModelSpec` stating its input contract once, and the
attack engine is generic over it.

Uniform contract for every Flax model in the zoo:
    flow = module.apply({'params': params}, img1, img2)
with `img1, img2` float32 (B, H, W, 3) in **[0, 1]**, H and W divisible by
`spec.pad_divisor`, returning flow (B, H, W, 2) at input resolution. Any
internal rescaling ([0,255], ImageNet normalization, [-1,1]) happens inside
the module — the perturbation always lives in unit image space, exactly like
the reference's `ScaledInputModel` with `make_unit_input=True`
(`own_models.py:83-85`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Static facts the runtime needs about one flow estimator."""

    name: str
    #: pad H, W to a multiple of this before calling (`ownutilities.py:241-280`)
    pad_divisor: int
    #: 'sintel' → centered padding; 'kitti' → bottom-only (`ownutilities.py:26-33`)
    pad_mode: str = "sintel"
    #: recurrent nets: number of update iterations (RAFT 12, GMA 6 —
    #: `raft/raft.py:86`, `ownutilities.py:327`)
    iters: int | None = None
    #: constructor returning the Flax module (kwargs may override defaults)
    make: Callable[..., Any] | None = None
    #: checkpoint-path/state-dict → flax params converter
    convert: Callable[..., Any] | None = None
    #: default constructor kwargs
    defaults: dict = dataclasses.field(default_factory=dict)


_REGISTRY: dict[str, ModelSpec] = {}


def register(spec: ModelSpec) -> ModelSpec:
    _REGISTRY[spec.name] = spec
    return spec


def get_spec(name: str) -> ModelSpec:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"Unknown flow network '{name}'. Registered: {sorted(_REGISTRY)}"
        ) from None


def available_models() -> list[str]:
    return sorted(_REGISTRY)
