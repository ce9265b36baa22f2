"""Box-constraint transforms: round trips and reference semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

from pcfa_tpu.attack import boxconstraint as bc


def test_cov_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0.01, 0.99, (3, 4, 4)).astype(np.float32))
    w = bc.cov_inverse(x, bc.EPS_BOX_DEFAULT)
    back = bc.cov_forward(w, bc.EPS_BOX_DEFAULT)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_cov_output_in_unit_range(rng):
    # cov_forward lands within eps_box of [0,1]; the pipeline clamps after,
    # exactly as ScaledInputModel does (own_models.py:78-80).
    w = jnp.asarray(rng.standard_normal((3, 4, 4)).astype(np.float32) * 10)
    x = bc.cov_forward(w)
    eps = bc.EPS_BOX_DEFAULT
    assert float(x.min()) >= -eps and float(x.max()) <= 1.0 + eps


def test_extract_deltas_clipping(rng):
    img = jnp.asarray(rng.uniform(0, 1, (1, 4, 4, 3)).astype(np.float32))
    nw = img + 0.3  # some values exceed 1 → clipped
    d1, d2 = bc.extract_deltas(nw, nw, img, img, "clipping")
    np.testing.assert_allclose(
        np.asarray(d1), np.clip(np.asarray(nw), 0, 1) - np.asarray(img), atol=1e-7
    )
    assert np.allclose(np.asarray(d1), np.asarray(d2))


def test_extract_deltas_cov_zero_at_init(rng):
    img = jnp.asarray(rng.uniform(0.1, 0.9, (1, 4, 4, 3)).astype(np.float32))
    w1, w2 = bc.init_nw_inputs(img, img, "change_of_variables")
    d1, d2 = bc.extract_deltas(w1, w2, img, img, "change_of_variables", bc.EPS_BOX_DEFAULT)
    np.testing.assert_allclose(np.asarray(d1), 0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2), 0, atol=1e-5)


def test_extract_deltas_joint_double_clamp(rng):
    imgs = rng.uniform(0, 1, (2, 1, 4, 4, 3)).astype(np.float32)
    imax = jnp.asarray(np.maximum(imgs[0], imgs[1]))
    imin = jnp.asarray(np.minimum(imgs[0], imgs[1]))
    nw_delta = jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32))
    d1, d2 = bc.extract_deltas_joint(nw_delta, imax, imin)
    # Both images stay in range after adding the effective joint δ.
    assert float((imax + d1).max()) <= 1.0 + 1e-6
    assert float((imin + d1).min()) >= -1e-6
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_perturbed_images_clip(rng):
    nw = jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32) * 2)
    x1, x2 = bc.perturbed_images(nw, nw, "clipping")
    assert float(x1.min()) >= 0.0 and float(x1.max()) <= 1.0
