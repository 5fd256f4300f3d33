"""Headless validation of the human-override plumbing (VERDICT round-1
item 5): env.step_with_world_actions ordering, pause semantics, and the
interactive trainer's per-step controller consultation — no pygame, a
scripted fake viewer stands in for the real one."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.env import BasketballEnv, _step_written
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo.hparams import PPOParams

I32 = jnp.int32
CFG = SimConfig()


class FakeViewer:
    """Just enough surface for env + InteractiveTrainer."""

    def __init__(self, human_action=(1, 3, 0, 0, 0, 0), selected=0):
        self.training_paused = False
        self.controller_manager = None
        self._human_action = np.asarray(human_action, np.int32)
        self._selected = selected
        self.ticks = 0
        self.human_action_calls = 0

    def set_controller_manager(self, mgr):
        self.controller_manager = mgr

    def set_training_paused(self, paused):
        self.training_paused = paused

    def get_selected_agent_index(self):
        return self._selected

    def get_human_action(self):
        self.human_action_calls += 1
        return self._human_action

    def tick(self):
        self.ticks += 1


def test_step_with_world_actions_override_order():
    """The human action must survive the trainee bulk write (the
    round-1 implementation wrote human first and lost it; reference
    scripts/env.py:213-223 writes trainee slices first, then world 0)."""
    worlds, idx = 8, 1
    rng = np.random.RandomState(0)
    actions = jnp.asarray(rng.randint(0, 2, (worlds, 6)), I32)
    human = jnp.asarray([1, 5, 1, 0, 0, 0], I32)

    env = BasketballEnv(worlds, CFG, seed=3, trainee_agent_idx=idx)
    env.reset()
    ref_state = env.state

    env.step_with_world_actions(actions, human_action_world_0=human,
                                human_agent_idx=idx)

    # manual equivalent: bulk trainee write, then world-0 override, step
    acts = ref_state.agents.action.at[:, idx].set(actions)
    acts = acts.at[0, idx].set(human)
    manual = _step_written(
        CFG, ref_state.replace(agents=ref_state.agents.replace(action=acts)))

    np.testing.assert_allclose(np.asarray(env.state.agents.pos),
                               np.asarray(manual.agents.pos), atol=0)
    np.testing.assert_array_equal(np.asarray(env.state.agents.action),
                                  np.asarray(manual.agents.action))


def test_pause_freezes_sim_but_ticks_viewer():
    env = BasketballEnv(4, CFG, seed=1, trainee_agent_idx=0,
                        viewer=FakeViewer())
    env.reset()
    env.viewer.training_paused = True
    step_before = np.asarray(env.state.agents.cur_step).copy()
    pos_before = np.asarray(env.state.agents.pos).copy()
    ticks_before = env.viewer.ticks
    env.step_with_world_actions(jnp.ones((4, 6), I32))
    assert env.is_training_paused()
    np.testing.assert_array_equal(np.asarray(env.state.agents.cur_step),
                                  step_before)
    np.testing.assert_array_equal(np.asarray(env.state.agents.pos),
                                  pos_before)
    assert env.viewer.ticks == ticks_before + 1  # interaction still runs

    env.viewer.training_paused = False
    env.step_with_world_actions(jnp.ones((4, 6), I32))
    assert not env.is_training_paused()
    # cur_step advances every unpaused tick (tick system, systems.py:135)
    np.testing.assert_array_equal(np.asarray(env.state.agents.cur_step),
                                  step_before + 1)


def test_interactive_trainer_consults_controller_every_step():
    from madrona_basketball_tpu.ppo.train_interactive import (
        InteractiveTrainer)

    hp = PPOParams(num_envs=8, num_rollout_steps=3, num_minibatches=2,
                   update_epochs=1, trainee_idx=0)
    net, _ = init_agent(jax.random.PRNGKey(0))
    viewer = FakeViewer(selected=0)
    tr = InteractiveTrainer(CFG, hp, net, jax.random.PRNGKey(5),
                            viewer=viewer)
    # the manager reached the viewer through env.set_controller_manager
    assert viewer.controller_manager is tr.controller_manager

    tr.controller_manager.set_human_control(True)
    metrics = tr.train_iteration()
    assert viewer.human_action_calls == hp.num_rollout_steps
    assert np.isfinite(float(metrics["adv_abs_mean"]))

    # with human control off the viewer's keyboard is never read
    tr.controller_manager.set_human_control(False)
    tr.train_iteration()
    assert viewer.human_action_calls == hp.num_rollout_steps
