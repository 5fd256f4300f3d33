"""Generalized Advantage Estimation as a reverse `lax.scan`.

Replaces the reference's reversed Python loop over the 32-step horizon
(scripts/ppo.py:152-166) with a single fused scan — including its exact
boundary quirk: at t = T-1 the non-terminal mask is not_dones[T-1] (not
not_dones[T]) paired with the bootstrap value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(rewards: jax.Array, values: jax.Array, not_dones: jax.Array,
                next_value: jax.Array, gamma: float, gae_lambda: float):
    """All inputs (T, N) except next_value (N,); returns (advantages, returns).

    `values` and `next_value` must already be in unnormalized (reward) space
    (the caller un-normalizes critic outputs first, scripts/ppo.py:149-150).
    """
    # Per-step "next" values/masks, replicating scripts/ppo.py:156-161:
    #   t <  T-1: next_values = values[t+1],  nnt = not_dones[t+1]
    #   t == T-1: next_values = next_value,   nnt = not_dones[T-1]
    next_values = jnp.concatenate([values[1:], next_value[None]], axis=0)
    nnt = jnp.concatenate([not_dones[1:], not_dones[-1:]], axis=0)

    deltas = rewards + gamma * next_values * nnt - values

    def body(last_gae, xs):
        delta_t, nnt_t = xs
        adv = delta_t + gamma * gae_lambda * nnt_t * last_gae
        return adv, adv

    _, advs_rev = jax.lax.scan(body, jnp.zeros_like(next_value),
                               (deltas[::-1], nnt[::-1]))
    advantages = advs_rev[::-1]
    returns = advantages + values
    return advantages, returns
