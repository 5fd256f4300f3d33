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
def _step_written(cfg: SimConfig, s: State) -> State:
    """Advance one tick with the action tensor already written."""
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
        self.controller_manager = None
        self.training_paused = False

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

    # ---- interactive-control plumbing (scripts/env.py:186-207) ----
    def set_controller_manager(self, controller_manager):
        """Attach a SimpleControllerManager for interactive training/eval;
        also forwarded to the embedded viewer so its H key toggles it."""
        self.controller_manager = controller_manager
        if self.viewer is not None:
            self.viewer.set_controller_manager(controller_manager)

    def toggle_human_control(self):
        if self.controller_manager is not None:
            self.controller_manager.set_human_control(
                not self.controller_manager.is_human_control_active())

    def is_training_paused(self) -> bool:
        return self.training_paused

    def set_training_paused(self, paused: bool):
        self.training_paused = paused
        if self.viewer is not None:
            self.viewer.set_training_paused(paused)

    def step_with_world_actions(self, actions, human_action_world_0=None,
                                human_agent_idx=None):
        """Step with trainee actions, optionally overriding world 0's
        selected agent with a human action (scripts/env.py:213-251).

        Order matters and follows the reference: trainee (+frozen) slices
        are written for ALL worlds first, then world 0 is overridden, so
        the human action survives.  While the viewer reports paused, the
        sim does not advance (world-0 action zeroed to freeze the agent
        visually) but the viewer still ticks for interaction handling.
        """
        acts = self.state.agents.action
        acts = acts.at[:, self.agent_idx].set(
            jnp.asarray(actions).astype(I32))
        if self.frozen_policy is not None:
            frozen_idx = 1 - self.agent_idx
            fa = self.frozen_policy(self.state.agents.obs[:, frozen_idx])
            acts = acts.at[:, frozen_idx].set(jnp.asarray(fa).astype(I32))
        idx = human_agent_idx if human_agent_idx is not None \
            else self.agent_idx
        if human_action_world_0 is not None:
            acts = acts.at[0, idx].set(
                jnp.asarray(human_action_world_0, I32))
        if self.viewer is not None and \
                getattr(self.viewer, "training_paused", False):
            self.training_paused = True
            acts = acts.at[0, idx].set(jnp.zeros((6,), I32))
        else:
            self.training_paused = False
        self.state = self.state.replace(
            agents=self.state.agents.replace(action=acts))
        if not self.training_paused:
            self.state = _step_written(self.cfg, self.state)
        if self.viewer is not None and self.first_reset_done:
            self.viewer.tick()
        a = self.state.agents
        i = self.agent_idx
        return a.obs[:, i], a.reward[:, i], a.done[:, i]
