"""Mosaic-lowerable transcendental approximations.

Pallas TPU (Mosaic) does not lower atan / atan2 / acos / erf.  The fused
step kernel needs exactly two of them — atan (shot-percentage make-angle,
src/game.cpp:806) and erf (make-probability, src/game.cpp:808) — the other
trig call sites are eliminated algebraically (see ops/pallas_step.py).

Implementations are classic float32 minimax polynomials, accurate to ~1e-6
absolute, unit-tested against NumPy (tests/test_tmath.py).  They are plain
jnp code, so they also run (and are tested) outside kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

HALF_PI = 1.5707963267948966


def atan(x):
    """arctan via an 11th-order odd minimax polynomial on |t|<=1 plus the
    reciprocal identity atan(x) = sign(x)*pi/2 - atan(1/x) for |x|>1."""
    ax = jnp.abs(x)
    big = ax > 1.0
    t = jnp.where(big, 1.0 / jnp.maximum(ax, 1e-30), ax)
    r = t * t
    p = -0.0117212
    p = p * r + 0.05265332
    p = p * r - 0.11643287
    p = p * r + 0.19354346
    p = p * r - 0.33262347
    p = p * r + 0.99997726
    a = t * p
    a = jnp.where(big, HALF_PI - a, a)
    return jnp.where(x < 0.0, -a, a)


def atan2(y, x):
    """Quadrant-corrected atan; matches C std semantics incl. atan2(0,0)=0."""
    safe_x = jnp.where(x == 0.0, 1.0, x)
    base = atan(y / safe_x)
    out = jnp.where(x > 0.0, base,
                    jnp.where(y >= 0.0, base + jnp.pi, base - jnp.pi))
    out = jnp.where(x == 0.0,
                    jnp.where(y > 0.0, HALF_PI,
                              jnp.where(y < 0.0, -HALF_PI, 0.0)),
                    out)
    return out


def acos(x):
    """arccos(x) = atan2(sqrt(1-x^2), x), clamped domain."""
    xc = jnp.clip(x, -1.0, 1.0)
    return atan2(jnp.sqrt(jnp.maximum(1.0 - xc * xc, 0.0)), xc)


def erf(x):
    """Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7)."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    p = 1.061405429
    p = p * t - 1.453152027
    p = p * t + 1.421413741
    p = p * t - 0.284496736
    p = p * t + 0.254829592
    y = 1.0 - p * t * jnp.exp(-ax * ax)
    return s * y
