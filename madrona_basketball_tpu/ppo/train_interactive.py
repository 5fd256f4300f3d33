"""Interactive PPO trainer: host-loop rollout with human override.

The production trainers fuse the whole rollout on device, which is why
they are fast — and why a human cannot reach into step 17 of a compiled
scan.  The reference trains through its EnvWrapper one step at a time
precisely so the viewer can take over world 0 mid-training
(scripts/ppo.py:60-141: per-step `controller_manager` consultation,
`env.step_with_world_actions`, pause).  This module reproduces that
capability: the rollout loop runs on the host through `BasketballEnv`
(policy forward jitted, one sim dispatch per step), the viewer ticks
every step, the `H` key hands world 0's selected agent to the keyboard,
Ctrl+P pauses the sim; the GAE/update phase is the same jitted code the
production trainers use (ppo/train.make_update_fns).

Use for interactive/debugging sessions (`cli.py --interactive`); use the
fused/rollout-kernel trainers for throughput.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import SimConfig
from ..controllers import SimpleControllerManager
from ..env import BasketballEnv
from ..models import agent as agent_lib
from ..models.agent import ActorCritic, AgentParams
from .hparams import PPOParams
from .train import init_stats, make_optimizer, make_update_fns, _stats_step

F32 = jnp.float32
I32 = jnp.int32


class InteractiveTrainer:
    """One object = one training session over a live `BasketballEnv`."""

    def __init__(self, cfg: SimConfig, hp: PPOParams, net: ActorCritic,
                 key: jax.Array, agent: Optional[AgentParams] = None,
                 frozen: Optional[AgentParams] = None, viewer=None,
                 seed: int = 0, timer=None):
        from ..utils.timers import PPOTimer
        self.hp = hp
        self.net = net
        # Host-loop trainer = host-visible phase boundaries: fence and
        # time rollout/sim/inference/update exactly like the reference
        # (scripts/ppo.py:303-327, scripts/ppo_stats.py:53-150).
        self.timer = timer if timer is not None else PPOTimer()
        k_agent, k_frozen, self.key = jax.random.split(key, 3)
        self.agent = agent if agent is not None else \
            agent_lib.init_agent(k_agent)[1]
        frozen_params = frozen if frozen is not None else \
            agent_lib.init_agent(k_frozen)[1]

        frozen_fn = None
        if hp.use_frozen:
            state = {"key": jax.random.PRNGKey(seed + 7)}

            @jax.jit
            def ffwd(k, obs):
                a, _, _ = agent_lib.forward(net, frozen_params, obs, k)
                return a

            def frozen_fn(obs):  # noqa: F811
                state["key"], k = jax.random.split(state["key"])
                return ffwd(k, obs)

        self.env = BasketballEnv(hp.num_envs, cfg, seed=seed,
                                 frozen_policy=frozen_fn,
                                 trainee_agent_idx=hp.trainee_idx,
                                 viewer=viewer)
        # scripts/ppo.py:257-258: manager constructed over the live agent
        # and handed to the env (which forwards it to the viewer).
        self.controller_manager = SimpleControllerManager(
            net, self.agent, seed=seed)
        self.env.set_controller_manager(self.controller_manager)

        tx = make_optimizer(hp)
        self.tx = tx
        self.opt_state = tx.init(self.agent.params)
        self.stats = init_stats(hp.num_envs)
        self._stats_step = jax.jit(_stats_step)
        ca, up = make_update_fns(hp, net)
        self._compute_advantages = jax.jit(ca)
        self._update_policy = jax.jit(up)

        @jax.jit
        def fwd(agent, obs, k):
            return agent_lib.forward(net, agent, obs, k)

        self._fwd = fwd

        @jax.jit
        def evaluate(agent, obs):
            return agent_lib.evaluate(net, agent, obs)

        self._evaluate = evaluate

    def rollout(self):
        """One T-step rollout with per-step human-override consultation
        (scripts/ppo.py:60-141 minus the npz recording, which cli.py's
        EpisodeRecorder handles from the returned buffer)."""
        hp, env, tm = self.hp, self.env, self.timer
        tm.start("rollout")
        obs, _, _ = env.reset()
        rows = {k: [] for k in ("obs", "actions", "values", "log_probs",
                                "not_dones", "rewards")}
        mgr = self.controller_manager
        for _ in range(hp.num_rollout_steps):
            self.key, k1 = jax.random.split(self.key)
            tm.start("inference")
            actions, logp, value = self._fwd(self.agent, obs, k1)
            jax.block_until_ready(value)
            tm.end("inference")
            tm.start("sim")
            if env.viewer is not None and mgr.is_human_control_active():
                selected = env.viewer.get_selected_agent_index()
                human_action = mgr.get_action(np.asarray(obs[0]),
                                              env.viewer)
                obs_, rews, dones = env.step_with_world_actions(
                    actions, human_action, selected)
            else:
                obs_, rews, dones = env.step_with_world_actions(actions)
            jax.block_until_ready(obs_)
            tm.end("sim")
            self.stats = self._stats_step(self.stats, rews, dones)
            rows["obs"].append(obs)
            rows["actions"].append(actions)
            rows["values"].append(value)
            rows["log_probs"].append(logp)
            rows["not_dones"].append(1.0 - dones)
            rows["rewards"].append(rews)
            obs = obs_
        buf = {k: jnp.stack(v) for k, v in rows.items()}
        buf["next_value"] = self._evaluate(self.agent, obs)
        tm.end("rollout")
        return buf

    def train_iteration(self):
        """rollout -> GAE -> update; returns metrics dict."""
        buf = self.rollout()
        self.key, k_upd = jax.random.split(self.key)
        agent, adv, values_n, returns_n = self._compute_advantages(
            self.agent, buf)
        self.timer.start("update")
        self.agent, self.opt_state = self._update_policy(
            agent, self.opt_state, buf, adv, values_n, returns_n, k_upd)
        jax.block_until_ready(
            jax.tree_util.tree_leaves(self.agent.params)[0])
        self.timer.end("update")
        # keep the manager's RL controller on the latest weights
        self.controller_manager.rl_controller.agent_params = self.agent
        return {
            "mean_reward": self.stats.mean_reward,
            "mean_episode_length": self.stats.mean_length,
            "reward_window": self.stats.reward_size,
            "adv_abs_mean": jnp.abs(adv).mean(),
            "value_mean": values_n.mean(),
        }
