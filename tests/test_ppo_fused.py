"""Fused-trainer tests: agreement with the structured trainer + smoke."""

import jax
import numpy as np
import pytest

from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo import train as T
from madrona_basketball_tpu.ppo import train_fused as TF

CFG = SimConfig()
HP = PPOParams(num_envs=16, num_rollout_steps=8, num_minibatches=2,
               update_epochs=2)


def test_fused_trainer_matches_structured_one_iteration():
    """Both trainers thread RNG identically (per-world env keys, same
    rollout key splits), so one iteration from the same seed must produce
    near-identical parameters (up to f32 reassociation in the sim math)."""
    net, _ = init_agent(jax.random.PRNGKey(0))

    ts_s = T.init_train_state(CFG, HP, net, jax.random.PRNGKey(11))
    it_s = T.make_train_iteration(CFG, HP, net)
    ts_s, m_s = it_s(ts_s)

    ts_f = TF.init_fused_train_state(CFG, HP, net, jax.random.PRNGKey(11))
    it_f = TF.make_train_iteration_fused(CFG, HP, net, backend="xla")
    ts_f, m_f = it_f(ts_f)

    for a, b in zip(jax.tree.leaves(ts_s.agent.params),
                    jax.tree.leaves(ts_f.agent.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=1e-3)
    np.testing.assert_allclose(float(m_s["adv_abs_mean"]),
                               float(m_f["adv_abs_mean"]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ts_s.agent.obs_rms.mean),
                               np.asarray(ts_f.agent.obs_rms.mean),
                               atol=1e-3)


def test_fused_trainer_multi_iteration_smoke():
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = TF.init_fused_train_state(CFG, HP, net, jax.random.PRNGKey(5))
    it = TF.make_train_iteration_fused(CFG, HP, net, backend="xla")
    for _ in range(3):
        ts, m = it(ts)
    for leaf in jax.tree.leaves(ts.agent.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(ts.agent.obs_rms.count) == 1 + 3 * 8 * 16


def test_fused_trainer_frozen_selfplay():
    hp = PPOParams(num_envs=8, num_rollout_steps=4, num_minibatches=2,
                   update_epochs=1, use_frozen=True, trainee_idx=0)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = TF.init_fused_train_state(CFG, hp, net, jax.random.PRNGKey(5))
    it = TF.make_train_iteration_fused(CFG, hp, net, backend="xla")
    ts, m = it(ts)
    assert np.isfinite(float(m["adv_abs_mean"]))


def test_fused_trainer_world0_recording():
    hp = PPOParams(num_envs=8, num_rollout_steps=4, num_minibatches=2,
                   update_epochs=1, record_world0=True)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = TF.init_fused_train_state(CFG, hp, net, jax.random.PRNGKey(6))
    it = TF.make_train_iteration_fused(CFG, hp, net, backend="xla")
    ts, m = it(ts)
    w0 = jax.device_get(m["world0"])
    assert w0["agent_pos"].shape == (4, 1, 2, 3)
    assert w0["game_state"].shape == (4, 1, 14)
    assert w0["done"].shape == (4, 1)


def test_rollout_kernel_trainer_interpret():
    """The FLAGSHIP trainer — policy-in-the-loop rollout kernel +
    scalar-prefetch fused-gradient update — end to end in interpret mode:
    trains, stays finite, and threads normalizer counts exactly like the
    scan trainer."""
    hp = PPOParams(num_envs=16, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=2, use_frozen=True, trainee_idx=1)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = TF.init_fused_train_state(CFG, hp, net, jax.random.PRNGKey(5))
    it = TF.make_train_iteration_fused(CFG, hp, net, backend="xla",
                                       rollout_kernel=True,
                                       rollout_interpret=True)
    p0 = jax.tree.leaves(ts.agent.params)[0]
    for _ in range(2):
        ts, m = it(ts)
    for leaf in jax.tree.leaves(ts.agent.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert not np.allclose(np.asarray(p0),
                           np.asarray(jax.tree.leaves(ts.agent.params)[0]))
    assert np.isfinite(float(m["adv_abs_mean"]))
    # obs normalizer consumed every rollout sample (T * N per iteration)
    assert float(ts.agent.obs_rms.count) == 1 + 2 * 8 * 16


def test_rollout_kernel_trainer_interpret_no_frozen():
    """The flagship trainer on the canonical learning task (defender
    trainee, no frozen opponent — in-sim hardCodeDefense drives the
    offense): the config the convergence/overlay evidence runs use."""
    hp = PPOParams(num_envs=16, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=2, use_frozen=False, trainee_idx=1)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = TF.init_fused_train_state(CFG, hp, net, jax.random.PRNGKey(5))
    it = TF.make_train_iteration_fused(CFG, hp, net, backend="xla",
                                       rollout_kernel=True,
                                       rollout_interpret=True)
    p0 = jax.tree.leaves(ts.agent.params)[0]
    for _ in range(2):
        ts, m = it(ts)
    for leaf in jax.tree.leaves(ts.agent.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert not np.allclose(np.asarray(p0),
                           np.asarray(jax.tree.leaves(ts.agent.params)[0]))
    assert np.isfinite(float(m["adv_abs_mean"]))
    assert float(ts.agent.obs_rms.count) == 1 + 2 * 8 * 16


def test_fused_trainer_full_game_config():
    """The trainer runs on the full-basketball ruleset (is1v1=0 branches:
    scoring inbounds, OOB turnovers, quarter rollover) — not just tag."""
    import jax
    import numpy as np
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo import train_fused as TF

    cfg = SimConfig(one_on_one=False, tag_mode=False)
    hp = PPOParams(num_envs=32, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=1)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
    it = TF.make_train_iteration_fused(cfg, hp, net, backend="xla")
    for _ in range(2):
        ts, m = it(ts)
    leaf = np.asarray(jax.tree_util.tree_leaves(ts.agent.params)[0])
    assert np.isfinite(leaf).all()
    assert np.isfinite(np.asarray(ts.sf)).all()
