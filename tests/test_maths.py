"""Unit tests for geometry helpers against hand-computed cases."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu.maths import (find_rotation_between_vectors,
                                          quat_angle_axis, quat_mul,
                                          quat_rotate)
from madrona_basketball_tpu.systems import get_shot_point_value


def test_quat_rotate_z90():
    q = quat_angle_axis(math.pi / 2, jnp.array([0.0, 0.0, 1.0]))
    v = quat_rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)


def test_quat_mul_composition():
    qa = quat_angle_axis(0.3, jnp.array([0.0, 0.0, 1.0]))
    qb = quat_angle_axis(0.5, jnp.array([0.0, 0.0, 1.0]))
    qc = quat_angle_axis(0.8, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(quat_mul(qa, qb)), np.asarray(qc),
                               atol=1e-6)


def test_initial_orientation_faces_sideline():
    # Agent 0 spawns rotated -pi/2 about z (src/gen.cpp:196): forward (0,1,0)
    # maps to (1,0,0)... rotation by -90deg about z sends +y to +x? No:
    # R(-90deg) * (0,1,0) = (sin(-(-90))? compute numerically.
    q = quat_angle_axis(-math.pi / 2, jnp.array([0.0, 0.0, 1.0]))
    v = np.asarray(quat_rotate(q, jnp.array([0.0, 1.0, 0.0])))
    np.testing.assert_allclose(v, [1.0, 0.0, 0.0], atol=1e-6)


def test_rotation_between_vectors_cases():
    fwd = jnp.array([0.0, 1.0, 0.0])
    # aligned -> identity
    q = find_rotation_between_vectors(fwd, jnp.array([0.0, 2.0, 0.0]))
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-5)
    # opposite -> 180 about z
    q = find_rotation_between_vectors(fwd, jnp.array([0.0, -1.0, 0.0]))
    np.testing.assert_allclose(np.abs(np.asarray(q)), [0, 0, 0, 1], atol=1e-5)
    # general: fwd -> +x is -90deg about z
    q = find_rotation_between_vectors(fwd, jnp.array([1.0, 0.0, 0.0]))
    v = np.asarray(quat_rotate(q, fwd))
    np.testing.assert_allclose(v, [1, 0, 0], atol=1e-5)


@pytest.mark.parametrize("pos,hoop,expected", [
    # Right under the left hoop: 2 points.
    ((3.3, 8.5, 0.0), (3.25, 8.5, 0.0), 2),
    # Beyond the arc (>7.24m straight away): 3 points.
    ((12.0, 8.5, 0.0), (3.25, 8.5, 0.0), 3),
    # Corner three: inside corner lane, within corner length of left baseline.
    ((2.0, C.COURT_MIN_Y + 0.5, 0.0), (3.25, 8.5, 0.0), 3),
    # Corner lane but too far down-court for the corner 3 and inside the arc.
    ((C.COURT_MIN_X + C.CORNER_3_LENGTH_FROM_BASELINE_M + 0.5,
      C.COURT_MIN_Y + 0.5, 0.0), (6.0, C.COURT_MIN_Y + 0.5, 0.0), 2),
    # Right hoop corner three.
    ((30.0, C.COURT_MAX_Y - 0.5, 0.0), (28.75, 8.5, 0.0), 3),
    # Mid-range: 2 points.
    ((8.0, 8.5, 0.0), (3.25, 8.5, 0.0), 2),
])
def test_shot_point_value(pos, hoop, expected):
    got = int(get_shot_point_value(jnp.array(pos, jnp.float32),
                                   jnp.array(hoop, jnp.float32)))
    assert got == expected
