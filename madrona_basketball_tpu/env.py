"""Vectorized environment facade.

The host-side counterpart of the reference's `EnvWrapper` (scripts/env.py:
16-252) with the same step/reset contract, minus torch: observations,
rewards and dones stay on-device `jax.Array`s end-to-end.  Action writing +
the sim step are fused into one jitted dispatch (the reference crosses the
Python->C++ boundary per step; here one XLA call steps every world).

The on-device PPO trainer does NOT go through this class — it uses the pure
`engine.step` inside `lax.scan` (see ppo/train.py).  This wrapper serves
interactive use, evaluation, benchmarking, and the viewer.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import constants as C
from . import engine
from .config import DEFAULT_CONFIG, SimConfig
from .export import export_tensors
from .state import State

I32 = jnp.int32


@functools.partial(jax.jit, static_argnums=(0,))
def _write_all_and_step(cfg: SimConfig, s: State, actions) -> State:
    s = s.replace(agents=s.agents.replace(action=actions.astype(I32)))
    return jax.vmap(lambda w: engine.step(cfg, w))(s)


@functools.partial(jax.jit, static_argnums=(0, 3))
def _write_agent_and_step(cfg: SimConfig, s: State, actions,
                          agent_idx: int) -> State:
    new = s.agents.action.at[:, agent_idx].set(actions.astype(I32))
    s = s.replace(agents=s.agents.replace(action=new))
    return jax.vmap(lambda w: engine.step(cfg, w))(s)


@functools.partial(jax.jit, static_argnums=(0,))
def _set_reset_flags(cfg: SimConfig, s: State, value: int) -> State:
    flags = jnp.full_like(s.agents.reset, value)
    return s.replace(agents=s.agents.replace(reset=flags))


class BasketballEnv:
    """Gym-style vectorized env over `num_worlds` lockstep worlds."""

    def __init__(self, num_worlds: int, cfg: SimConfig = DEFAULT_CONFIG,
                 seed: int = 0,
                 frozen_policy: Optional[Callable] = None,
                 trainee_agent_idx: int = 0,
                 viewer=None):
        self.cfg = cfg
        self.num_worlds = num_worlds
        self.agent_idx = trainee_agent_idx
        self.state: State = engine.init_batch(cfg, jax.random.PRNGKey(seed),
                                              num_worlds)
        # Optional frozen-opponent policy for self-play:
        # obs (W, obs_dim) -> actions (W, 6)  (scripts/env.py:105-143).
        self.frozen_policy = frozen_policy
        self.viewer = viewer
        self.action_buckets = list(C.ACTION_BUCKETS)
        self.first_reset_done = False

    # ---- introspection (scripts/env.py:113-123) ----
    def get_action_space_size(self) -> int:
        return len(self.action_buckets)

    def get_input_dim(self) -> int:
        return C.OBS_SIZE

    def get_action_buckets(self):
        return self.action_buckets

    def set_agent_idx(self, agent_idx: int):
        self.agent_idx = agent_idx

    # ---- observation / action access ----
    @property
    def observations(self) -> jax.Array:
        return self.state.agents.obs

    def get_obs(self) -> jax.Array:
        return self.state.agents.obs[:, self.agent_idx]

    def get_blank_actions(self) -> jax.Array:
        return jnp.zeros((self.num_worlds, len(self.action_buckets)), I32)

    def tensors(self, bitcast_compat: bool = False) -> dict:
        """The reference's 18-tensor export API (src/mgr.cpp:315-445)."""
        return export_tensors(self.state, bitcast_compat=bitcast_compat)

    # ---- step / reset (scripts/env.py:125-185) ----
    def step(self, trainee_actions: jax.Array):
        if self.frozen_policy is not None:
            frozen_idx = 1 - self.agent_idx
            frozen_obs = self.state.agents.obs[:, frozen_idx]
            frozen_actions = self.frozen_policy(frozen_obs)
            if self.agent_idx == 0:
                combined = jnp.stack([trainee_actions, frozen_actions], axis=1)
            else:
                combined = jnp.stack([frozen_actions, trainee_actions], axis=1)
            self.state = _write_all_and_step(self.cfg, self.state, combined)
        else:
            self.state = _write_agent_and_step(self.cfg, self.state,
                                               trainee_actions,
                                               self.agent_idx)
        if self.viewer is not None and self.first_reset_done:
            self.viewer.tick()
        a = self.state.agents
        i = self.agent_idx
        return a.obs[:, i], a.reward[:, i], a.done[:, i]

    def reset(self):
        """Pulse the Reset flag for one step (scripts/env.py:178-185).

        Like the reference, this marks Done=1 / CurStep=0 for the learner but
        does NOT reposition entities — entity repositioning happens only via
        the in-sim WorldClock reset path (SURVEY §3.3).
        """
        self.state = _set_reset_flags(self.cfg, self.state, 1)
        out = self.step(jnp.zeros((self.num_worlds,
                                   len(self.action_buckets)), I32))
        self.state = _set_reset_flags(self.cfg, self.state, 0)
        self.first_reset_done = True
        return out

    def trigger_reset(self, world_idx: int):
        """Set the advisory Reset flag for one world
        (Manager::triggerReset, src/mgr.cpp:297-311): next step's tick marks
        done=1 / cur_step=0 for that world's agents."""
        flags = self.state.agents.reset.at[world_idx].set(1)
        self.state = self.state.replace(
            agents=self.state.agents.replace(reset=flags))

    def step_with_world_actions(self, actions, human_action_world_0=None,
                                human_agent_idx=None):
        """Step, optionally overriding world 0 with a human action
        (scripts/env.py:214-252)."""
        if human_action_world_0 is not None:
            idx = human_agent_idx if human_agent_idx is not None \
                else self.agent_idx
            cur = self.state.agents.action
            cur = cur.at[0, idx].set(jnp.asarray(human_action_world_0, I32))
            self.state = self.state.replace(
                agents=self.state.agents.replace(action=cur))
        return self.step(actions)
