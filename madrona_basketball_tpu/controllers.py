"""Agent controllers: RL policy / human keyboard / hard-coded rules.

Port of scripts/controllers.py:5-93 minus torch: controllers map a single
observation vector to a 6-int action; the manager toggles human override for
interactive training/eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .models import agent as agent_lib


class Controller:
    """Base class for all methods of controlling an agent."""

    def get_action(self, obs, viewer_instance=None):
        raise NotImplementedError


class RLController(Controller):
    """Runs the trained policy on a single observation."""

    def __init__(self, net, agent_params, seed: int = 0):
        self.net = net
        self.agent_params = agent_params
        self._key = jax.random.PRNGKey(seed)

    def get_action(self, obs, viewer_instance=None):
        self._key, k = jax.random.split(self._key)
        actions, _, _ = agent_lib.forward(
            self.net, self.agent_params,
            jnp.asarray(obs, jnp.float32)[None], k)
        return np.asarray(actions[0])


class HumanController(Controller):
    """Keyboard input via the viewer (scripts/controllers.py:65-81)."""

    def get_action(self, obs, viewer_instance=None):
        if viewer_instance is not None:
            return np.asarray(viewer_instance.get_human_action(),
                              dtype=np.int32)
        return np.zeros(6, np.int32)


class RulesController(Controller):
    """Hard-coded policy: shoot if holding the ball, else try to grab.

    The reference reads obs[30] as hasBall (scripts/controllers.py:89) but
    index 30 is actually the self-orientation quaternion's w component in
    the observation layout; the true hasBall slot is the LAST element of
    the 38-float self block, which starts at index 23 -> 23 + 37 = 60
    (obs[59] is pointsWorth, always >= 2).  This port uses the correct
    slot; tests/test_viewer_infer.py pins it against the live engine.
    """

    HAS_BALL_IDX = 60

    def get_action(self, obs, viewer_instance=None):
        obs = np.asarray(obs)
        if obs[self.HAS_BALL_IDX] > 0.5:
            return np.array([0, 0, 0, 0, 0, 1], np.int32)  # shoot
        return np.array([0, 0, 0, 1, 0, 0], np.int32)      # grab


class SimpleControllerManager:
    """Human-override toggle around the RL controller
    (scripts/controllers.py:18-45)."""

    def __init__(self, net, agent_params, seed: int = 0):
        self.rl_controller = RLController(net, agent_params, seed)
        self.human_controller = HumanController()
        self.human_control_active = False

    def set_human_control(self, active: bool):
        self.human_control_active = active
        print(f"Human control {'enabled' if active else 'disabled'}")

    def is_human_control_active(self) -> bool:
        return self.human_control_active

    def get_action(self, obs, viewer_instance=None):
        if self.human_control_active and viewer_instance is not None:
            return self.human_controller.get_action(obs, viewer_instance)
        return self.rl_controller.get_action(obs, viewer_instance)
