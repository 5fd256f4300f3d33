"""Multi-bucket discrete action distributions.

Functional port of `DiscreteActionDistributions` (scripts/action.py:4-45):
flat logits are sliced into one categorical per action bucket
([2, 8, 3, 2, 2, 2] — move, moveAngle, rotate, grab, pass, shoot);
sampling / argmax / log-prob / entropy all vectorize over the batch.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

I32 = jnp.int32


def _slices(buckets: Sequence[int]):
    off = 0
    for n in buckets:
        yield off, n
        off += n


def sample(key: jax.Array, logits: jax.Array, buckets: Sequence[int]):
    """Sample all buckets; returns (actions (B, K) i32, log_probs (B, K))."""
    keys = jax.random.split(key, len(buckets))
    actions, lps = [], []
    for k, (off, n) in zip(keys, _slices(buckets)):
        lg = logits[:, off:off + n]
        act = jax.random.categorical(k, lg, axis=-1)
        logp = jax.nn.log_softmax(lg, axis=-1)
        lps.append(jnp.take_along_axis(logp, act[:, None], axis=1)[:, 0])
        actions.append(act)
    return (jnp.stack(actions, axis=1).astype(I32),
            jnp.stack(lps, axis=1))


def best(logits: jax.Array, buckets: Sequence[int]) -> jax.Array:
    """Argmax per bucket (scripts/action.py:21-23)."""
    actions = [jnp.argmax(logits[:, off:off + n], axis=-1)
               for off, n in _slices(buckets)]
    return jnp.stack(actions, axis=1).astype(I32)


def log_probs(logits: jax.Array, actions: jax.Array,
              buckets: Sequence[int]) -> jax.Array:
    """Per-bucket log-probs of given actions; (B, K)."""
    lps = []
    for i, (off, n) in enumerate(_slices(buckets)):
        logp = jax.nn.log_softmax(logits[:, off:off + n], axis=-1)
        lps.append(jnp.take_along_axis(
            logp, actions[:, i][:, None].astype(I32), axis=1)[:, 0])
    return jnp.stack(lps, axis=1)


def action_stats(logits: jax.Array, actions: jax.Array,
                 buckets: Sequence[int]):
    """(log_probs (B, K), entropies (B, K)) — scripts/action.py:35-42."""
    lps, ents = [], []
    for i, (off, n) in enumerate(_slices(buckets)):
        logp = jax.nn.log_softmax(logits[:, off:off + n], axis=-1)
        p = jnp.exp(logp)
        lps.append(jnp.take_along_axis(
            logp, actions[:, i][:, None].astype(I32), axis=1)[:, 0])
        ents.append(-jnp.sum(p * logp, axis=-1))
    return jnp.stack(lps, axis=1), jnp.stack(ents, axis=1)
