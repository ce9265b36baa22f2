"""Native C++/OpenMP correlation kernels vs the XLA implementations."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcfa_tpu import native
from pcfa_tpu.ops import correlation as xla_corr

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_local_correlation_native_matches_xla(rng):
    f1 = rng.standard_normal((2, 10, 12, 8)).astype(np.float32)
    f2 = rng.standard_normal((2, 10, 12, 8)).astype(np.float32)
    ours = native.local_correlation(f1, f2, 9)
    ref = np.asarray(xla_corr.local_correlation(jnp.asarray(f1), jnp.asarray(f2), 9))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_global_correlation_native_matches_xla(rng):
    f1 = rng.standard_normal((1, 12, 14, 16)).astype(np.float32)
    f2 = rng.standard_normal((1, 12, 14, 16)).astype(np.float32)
    ours = native.global_correlation(f1, f2, 4, 2)
    ref = np.asarray(xla_corr.global_correlation(jnp.asarray(f1), jnp.asarray(f2), 4, 2))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_threads_reported():
    assert native.load().native_num_threads() >= 1
