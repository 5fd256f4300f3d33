"""Quaternion / vector / SAT geometry helpers.

TPU-native replacements for the madrona math types used by the reference
(src/types.hpp:6 `using namespace madrona::math`) and the helpers in
src/helper.cpp.  All functions are pure, float32, and branchless (jnp.where
instead of C++ early returns) so they trace cleanly under jit/vmap.

Quaternions are stored (w, x, y, z), matching the reference's export order
(src/mgr.cpp orientation tensor, scripts/viewer.py quat handling).
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32


def quat_id():
    return jnp.array([1.0, 0.0, 0.0, 0.0], F32)


def quat_angle_axis(angle, axis):
    """Quat::angleAxis — `axis` must be unit length; `angle` in radians."""
    axis = jnp.asarray(axis, F32)
    half = jnp.asarray(angle, F32) * 0.5
    w = jnp.cos(half)
    xyz = axis * jnp.sin(half)
    return jnp.concatenate([w[None], xyz])


def quat_mul(a, b):
    """Hamilton product a*b (applies b's rotation first, then a's)."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def quat_rotate(q, v):
    """Rotate vector v by unit quaternion q (Quat::rotateVec)."""
    w = q[0]
    u = q[1:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def length(v):
    return jnp.sqrt(jnp.sum(v * v))


def length2(v):
    return jnp.sum(v * v)


def safe_normalize(v, eps=1e-30):
    """v / |v| with a guard against division by zero (returns ~0 vector)."""
    return v * jnp.where(length2(v) > 0.0,
                         1.0 / jnp.sqrt(jnp.maximum(length2(v), eps)), 0.0)


def normalize_unsafe(v):
    """v / |v| exactly like madrona's normalize (inf/nan on zero input).

    Call sites in the reference that can mathematically receive a zero vector
    guard explicitly; the rest use this to keep identical numerics.
    """
    return v / length(v)


def find_rotation_between_vectors(start, target):
    """Quat aligning `start` with `target` (src/helper.cpp:14-42).

    Branchless version of the three-case C++ helper: aligned -> identity,
    opposite -> 180deg about Z, otherwise angle-axis about the normalized
    cross product.
    """
    s = safe_normalize(start)
    t = safe_normalize(target)
    d = jnp.sum(s * t)

    # General case.
    axis_raw = jnp.cross(s, t)
    axis = safe_normalize(axis_raw)
    angle = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    general = quat_angle_axis(angle, axis)

    opposite = quat_angle_axis(jnp.asarray(jnp.pi, F32),
                               jnp.array([0.0, 0.0, 1.0], F32))
    out = jnp.where(d < -0.999999, opposite, general)
    out = jnp.where(d > 0.999999, quat_id(), out)
    return out


def project_rectangle(vertices, axis):
    """SAT projection of 4 vertices onto an axis -> (min, max)
    (src/helper.cpp:85-100)."""
    projs = vertices @ axis
    return jnp.min(projs), jnp.max(projs)


def projections_overlap(p1_min, p1_max, p2_min, p2_max):
    """Strict-overlap test (src/helper.cpp:103-105)."""
    return (p1_max > p2_min) & (p2_max > p1_min)
