"""Tracing / profiling hooks (SURVEY.md §5 — absent in the reference).

* `trace(logdir)` — context manager around `jax.profiler` for TensorBoard
  traces of the jitted attack step.
* `StepTimer` — honest wall-clock step timing with `block_until_ready`
  fencing (async dispatch otherwise hides device time).
* `debug_nans()` — opt-in NaN checking, the functional replacement for the
  reference's always-on `torch.autograd.set_detect_anomaly(True)`
  (`attack_PCFA.py:41` — a sanitizer left enabled in production paths).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    prev = jax.config.read("jax_debug_nans")
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def fetch_fence(tree) -> float:
    """Force completion by fetching one scalar from the output tree.

    Through tunneled backends (axon) `jax.block_until_ready` does NOT wait;
    only value fetches do. Returns the fetched scalar."""
    import jax.numpy as jnp

    leaf = jax.tree.leaves(tree)[0]
    return float(jnp.sum(leaf.ravel()[:1]))


@dataclass
class StepTimer:
    """Accumulates fenced per-step wall times.

    >>> t = StepTimer()
    >>> with t.step():
    ...     out = attack_fn(x)      # dispatch
    (the context waits on `out` if you pass it to `fence`)
    """

    times: list = field(default_factory=list)

    @contextlib.contextmanager
    def step(self, fence=None):
        t0 = time.perf_counter()
        yield
        if fence is not None:
            jax.block_until_ready(fence)
        self.times.append(time.perf_counter() - t0)

    def fenced(self, fn, *args):
        """Run fn(*args), wait for completion, record the duration."""
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.times.append(time.perf_counter() - t0)
        return out

    @property
    def total(self) -> float:
        return sum(self.times)

    @property
    def mean(self) -> float:
        return self.total / len(self.times) if self.times else 0.0

    def summary(self) -> dict:
        if not self.times:
            return {"steps": 0}
        return {
            "steps": len(self.times),
            "mean_s": self.mean,
            "min_s": min(self.times),
            "max_s": max(self.times),
            "total_s": self.total,
        }
