"""Minimax transcendental approximations vs NumPy references."""

import numpy as np
import jax.numpy as jnp

from madrona_basketball_tpu.ops import tmath


def test_atan():
    x = np.linspace(-50, 50, 20001).astype(np.float32)
    got = np.asarray(tmath.atan(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arctan(x), atol=5e-6)


def test_atan2_quadrants():
    rng = np.random.RandomState(0)
    y = rng.uniform(-10, 10, 5000).astype(np.float32)
    x = rng.uniform(-10, 10, 5000).astype(np.float32)
    got = np.asarray(tmath.atan2(jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arctan2(y, x), atol=1e-5)
    # axes / origin
    assert float(tmath.atan2(jnp.float32(0), jnp.float32(0))) == 0.0
    np.testing.assert_allclose(float(tmath.atan2(jnp.float32(1),
                                                 jnp.float32(0))),
                               np.pi / 2, atol=1e-6)
    np.testing.assert_allclose(float(tmath.atan2(jnp.float32(0),
                                                 jnp.float32(-2))),
                               np.pi, atol=1e-6)


def test_acos():
    x = np.linspace(-1, 1, 10001).astype(np.float32)
    got = np.asarray(tmath.acos(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arccos(x), atol=2e-5)


def test_erf():
    x = np.linspace(-4, 4, 10001).astype(np.float32)
    got = np.asarray(tmath.erf(jnp.asarray(x)))
    from math import erf as merf
    want = np.array([merf(float(v)) for v in x], np.float32)
    # A&S 7.1.26 is 1.5e-7 in f64; f32 polynomial evaluation adds rounding.
    np.testing.assert_allclose(got, want, atol=5e-6)
