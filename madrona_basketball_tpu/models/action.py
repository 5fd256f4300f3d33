"""Multi-bucket discrete action distributions.

Functional port of `DiscreteActionDistributions` (scripts/action.py:4-45):
flat logits are sliced into one categorical per action bucket
([2, 8, 3, 2, 2, 2] — move, moveAngle, rotate, grab, pass, shoot);
sampling / argmax / log-prob / entropy all vectorize over the batch.

TPU notes: selected-action log-probs use one-hot masking instead of
`take_along_axis` — per-row gathers (and the scatters in their gradient)
are pathologically slow on TPU, while a compare+mask+reduce over <=8-wide
buckets is a few fused VPU ops and differentiates as dense math.  Sampling
draws ONE Gumbel tensor over the whole logit row and arg-maxes per bucket
(the Gumbel-max trick `jax.random.categorical` uses internally) instead of
six separate categorical calls: one PRNG invocation, same distribution.
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


def _select(logp: jax.Array, act: jax.Array) -> jax.Array:
    """logp (B, n), act (B,) -> logp[b, act[b]] without gathers."""
    n = logp.shape[-1]
    onehot = jnp.arange(n, dtype=I32) == act[:, None].astype(I32)
    return jnp.sum(jnp.where(onehot, logp, 0.0), axis=-1)


def sample(key: jax.Array, logits: jax.Array, buckets: Sequence[int]):
    """Sample all buckets; returns (actions (B, K) i32, log_probs (B, K))."""
    gumbel = jax.random.gumbel(key, logits.shape, logits.dtype)
    noisy = logits + gumbel
    actions, lps = [], []
    for off, n in _slices(buckets):
        act = jnp.argmax(noisy[:, off:off + n], axis=-1)
        logp = jax.nn.log_softmax(logits[:, off:off + n], axis=-1)
        lps.append(_select(logp, act))
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
        lps.append(_select(logp, actions[:, i]))
    return jnp.stack(lps, axis=1)


def action_stats(logits: jax.Array, actions: jax.Array,
                 buckets: Sequence[int]):
    """(log_probs (B, K), entropies (B, K)) — scripts/action.py:35-42."""
    lps, ents = [], []
    for i, (off, n) in enumerate(_slices(buckets)):
        logp = jax.nn.log_softmax(logits[:, off:off + n], axis=-1)
        p = jnp.exp(logp)
        lps.append(_select(logp, actions[:, i]))
        ents.append(-jnp.sum(p * logp, axis=-1))
    return jnp.stack(lps, axis=1), jnp.stack(ents, axis=1)
