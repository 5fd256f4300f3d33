"""Rollout storage.

API-parity port of the reference's `RolloutBuffer` (scripts/buffers.py:4-33)
as an immutable pytree.  The fused trainer (ppo/train.py) materializes the
same (T, N) layout directly out of `lax.scan` and never mutates in place;
this class exists for users who drive the env host-side (e.g. custom
training loops) and want the reference's buffer surface.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

F32 = jnp.float32


@struct.dataclass
class RolloutBuffer:
    obs: jax.Array        # (T, N, obs_dim)
    actions: jax.Array    # (T, N, act_dim)
    values: jax.Array     # (T, N)
    log_probs: jax.Array  # (T, N)
    rewards: jax.Array    # (T, N)
    not_dones: jax.Array  # (T, N)
    next_value: jax.Array  # (N,)
    advantages: jax.Array  # (T, N)
    returns: jax.Array    # (T, N)

    @property
    def horizon(self) -> int:
        return self.obs.shape[0]

    @property
    def n_envs(self) -> int:
        return self.obs.shape[1]

    def get_total_steps(self) -> int:
        return self.horizon * self.n_envs

    def set_step(self, t: int, obs, actions, values, log_probs, rewards,
                 not_dones) -> "RolloutBuffer":
        return self.replace(
            obs=self.obs.at[t].set(obs),
            actions=self.actions.at[t].set(actions),
            values=self.values.at[t].set(values),
            log_probs=self.log_probs.at[t].set(log_probs),
            rewards=self.rewards.at[t].set(rewards),
            not_dones=self.not_dones.at[t].set(not_dones),
        )

    def get_minibatch(self, indices: jax.Array):
        """Flat-index gather across (T*N,) — scripts/buffers.py:25-33."""
        o = self.obs.reshape(-1, self.obs.shape[-1])[indices]
        a = self.actions.reshape(-1, self.actions.shape[-1])[indices]
        lp = self.log_probs.reshape(-1)[indices]
        v = self.values.reshape(-1)[indices]
        adv = self.advantages.reshape(-1)[indices]
        ret = self.returns.reshape(-1)[indices]
        return o, a, lp, v, adv, ret


def make_buffer(n_steps: int, n_envs: int, obs_dim: int,
                act_dim: int) -> RolloutBuffer:
    return RolloutBuffer(
        obs=jnp.zeros((n_steps, n_envs, obs_dim), F32),
        actions=jnp.zeros((n_steps, n_envs, act_dim), jnp.int32),
        values=jnp.zeros((n_steps, n_envs), F32),
        log_probs=jnp.zeros((n_steps, n_envs), F32),
        rewards=jnp.zeros((n_steps, n_envs), F32),
        not_dones=jnp.zeros((n_steps, n_envs), F32),
        next_value=jnp.zeros((n_envs,), F32),
        advantages=jnp.zeros((n_steps, n_envs), F32),
        returns=jnp.zeros((n_steps, n_envs), F32),
    )
