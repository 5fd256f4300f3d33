"""Actor-critic policy network.

Flax port of the reference `Agent` (scripts/agent.py:108-182): a
(Linear -> LayerNorm -> ReLU) x num_layers backbone at 32 channels, an
18-logit multi-categorical actor head and a scalar critic head, plus
running-mean-std observation and value normalizers carried alongside the
parameters.

Init parity quirk: the reference calls
`kaiming_normal_(w, nn.init.calculate_gain("relu"))` (scripts/agent.py:98),
which passes sqrt(2) as kaiming's *negative-slope* argument `a`, yielding
std = sqrt(2 / (1 + 2)) / sqrt(fan_in) = sqrt(2/3 / fan_in) — NOT the usual
He init.  Reproduced via variance_scaling(2/3, fan_in, normal) so learning
curves start from the same distribution.  Heads are orthogonal(0.01) with
zero bias (scripts/agent.py:102-105).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .. import constants as C
from . import action as action_dist
from .normalize import RMSState, rms_init, rms_normalize, rms_unnormalize

F32 = jnp.float32

_backbone_init = nn.initializers.variance_scaling(
    2.0 / 3.0, "fan_in", "normal")
_head_init = nn.initializers.orthogonal(0.01)


class ActorCritic(nn.Module):
    num_channels: int = 32
    num_layers: int = 2
    action_dim: int = sum(C.ACTION_BUCKETS)

    @nn.compact
    def __call__(self, x):
        for _ in range(self.num_layers):
            x = nn.Dense(self.num_channels, kernel_init=_backbone_init,
                         bias_init=nn.initializers.zeros)(x)
            x = nn.LayerNorm()(x)
            x = nn.relu(x)
        logits = nn.Dense(self.action_dim, kernel_init=_head_init,
                          bias_init=nn.initializers.zeros)(x)
        value = nn.Dense(1, kernel_init=_head_init,
                         bias_init=nn.initializers.zeros)(x)
        return logits, value[..., 0]


@struct.dataclass
class AgentParams:
    """Everything the reference persists in a checkpoint: network weights +
    both normalizer states (scripts/ppo.py:343, scripts/agent.py:131-132)."""

    params: Any
    obs_rms: RMSState
    value_rms: RMSState


def init_agent(key: jax.Array, obs_dim: int = C.OBS_SIZE,
               num_channels: int = 32, num_layers: int = 2,
               action_buckets: Sequence[int] = C.ACTION_BUCKETS
               ) -> tuple[ActorCritic, AgentParams]:
    net = ActorCritic(num_channels=num_channels, num_layers=num_layers,
                      action_dim=sum(action_buckets))
    params = net.init(key, jnp.zeros((1, obs_dim), F32))
    return net, AgentParams(params=params,
                            obs_rms=rms_init(obs_dim),
                            value_rms=rms_init(1))


def forward(net: ActorCritic, ap: AgentParams, obs: jax.Array,
            key: jax.Array, stochastic: bool = True,
            buckets: Sequence[int] = C.ACTION_BUCKETS):
    """(actions, summed log-probs, value) — scripts/agent.py:140-154."""
    x = rms_normalize(ap.obs_rms, obs, clamp=5.0)
    logits, value = net.apply(ap.params, x)
    if stochastic:
        actions, lps = action_dist.sample(key, logits, buckets)
    else:
        actions = action_dist.best(logits, buckets)
        lps = action_dist.log_probs(logits, actions, buckets)
    return actions, lps.sum(axis=-1), value


def evaluate(net: ActorCritic, ap: AgentParams, obs: jax.Array) -> jax.Array:
    """Critic-only forward (scripts/agent.py:168-170)."""
    x = rms_normalize(ap.obs_rms, obs, clamp=5.0)
    _, value = net.apply(ap.params, x)
    return value


def get_stats(net: ActorCritic, ap: AgentParams, obs: jax.Array,
              actions: jax.Array,
              buckets: Sequence[int] = C.ACTION_BUCKETS):
    """(log_probs, entropies, value) for the PPO update
    (scripts/agent.py:172-178)."""
    x = rms_normalize(ap.obs_rms, obs, clamp=5.0)
    logits, value = net.apply(ap.params, x)
    lps, ents = action_dist.action_stats(logits, actions, buckets)
    return lps.sum(axis=-1), ents.sum(axis=-1), value


def unnorm_value(ap: AgentParams, values: jax.Array) -> jax.Array:
    return rms_unnormalize(ap.value_rms, values[..., None],
                           clamp=5.0)[..., 0]


def norm_value(ap: AgentParams, values: jax.Array) -> jax.Array:
    return rms_normalize(ap.value_rms, values[..., None], clamp=5.0)[..., 0]
