"""EMA mean/variance normalizer.

Functional port of the reference's `EMANormalizer` (scripts/moving_avg.py:
7-106) — defined there and importable but unused by the training path; kept
for capability parity.  Bias-corrected exponential moving estimates of mean
and sigma with the same f32 discipline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

F32 = jnp.float32


@struct.dataclass
class EMAState:
    mu: jax.Array              # ()
    inv_sigma: jax.Array       # ()
    sigma: jax.Array           # ()
    mu_biased: jax.Array       # ()
    sigma_sq_biased: jax.Array  # ()
    n: jax.Array               # () i64-ish counter (f32 is fine)
    decay: jax.Array           # ()
    eps: float = struct.field(pytree_node=False, default=1e-5)


def ema_init(decay: float, eps: float = 1e-5) -> EMAState:
    z = jnp.zeros((), F32)
    return EMAState(mu=z, inv_sigma=z, sigma=z, mu_biased=z,
                    sigma_sq_biased=z, n=z,
                    decay=jnp.asarray(decay, F32), eps=eps)


def ema_update(st: EMAState, x: jax.Array) -> EMAState:
    """One training-mode forward's statistics update
    (scripts/moving_avg.py:63-96)."""
    x = x.astype(F32)
    n = st.n + 1.0
    one_minus_decay = 1.0 - st.decay
    bias_correction = -jnp.expm1(n * jnp.log(st.decay))

    mu_biased = st.mu_biased * st.decay + x.mean() * one_minus_decay
    new_mu = mu_biased / bias_correction

    prev_mu = jnp.where(n == 1.0, new_mu, st.mu)
    sigma_sq_new = jnp.mean((x - prev_mu) * (x - new_mu))
    sigma_sq_biased = (st.sigma_sq_biased * st.decay +
                       sigma_sq_new * one_minus_decay)
    sigma_sq = sigma_sq_biased / bias_correction

    inv_sigma = jax.lax.rsqrt(jnp.clip(sigma_sq, min=st.eps))
    return st.replace(mu=new_mu, inv_sigma=inv_sigma,
                      sigma=1.0 / inv_sigma, mu_biased=mu_biased,
                      sigma_sq_biased=sigma_sq_biased, n=n)


def ema_normalize(st: EMAState, x: jax.Array) -> jax.Array:
    return (-st.mu * st.inv_sigma + x * st.inv_sigma).astype(x.dtype)


def ema_unnormalize(st: EMAState, x: jax.Array) -> jax.Array:
    return (st.mu + x.astype(F32) * st.sigma).astype(x.dtype)
