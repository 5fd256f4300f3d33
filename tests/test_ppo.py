"""On-device PPO trainer tests (small shapes; compile once per module)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo import train as T

CFG = SimConfig()
HP = PPOParams(num_envs=16, num_rollout_steps=8, num_minibatches=2,
               update_epochs=2)


@pytest.fixture(scope="module")
def trained():
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts0 = T.init_train_state(CFG, HP, net, jax.random.PRNGKey(42))
    it = T.make_train_iteration(CFG, HP, net)
    ts = ts0
    metrics = None
    for _ in range(3):
        ts, metrics = it(ts)
    jax.block_until_ready(ts.agent.params)
    return net, ts0, ts, metrics


def test_params_update_and_stay_finite(trained):
    net, ts0, ts, metrics = trained
    p0 = jax.tree.leaves(ts0.agent.params)
    p1 = jax.tree.leaves(ts.agent.params)
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(p0, p1))
    assert changed, "parameters did not change after 3 iterations"
    for leaf in p1:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_normalizer_counts_advance(trained):
    net, ts0, ts, metrics = trained
    # obs_rms: 1 (init) + iters * T * N;  value_rms: double update per iter
    expect_obs = 1 + 3 * HP.num_rollout_steps * HP.num_envs
    expect_val = 1 + 2 * 3 * HP.num_rollout_steps * HP.num_envs
    assert float(ts.agent.obs_rms.count) == expect_obs
    assert float(ts.agent.value_rms.count) == expect_val


def test_metrics_finite(trained):
    net, ts0, ts, metrics = trained
    for k, v in metrics.items():
        assert np.all(np.isfinite(np.asarray(v))), k


def test_train_determinism():
    net, _ = init_agent(jax.random.PRNGKey(0))
    it = T.make_train_iteration(CFG, HP, net)
    ts_a = T.init_train_state(CFG, HP, net, jax.random.PRNGKey(9))
    ts_b = T.init_train_state(CFG, HP, net, jax.random.PRNGKey(9))
    ts_a, _ = it(ts_a)
    ts_b, _ = it(ts_b)
    for a, b in zip(jax.tree.leaves(ts_a.agent.params),
                    jax.tree.leaves(ts_b.agent.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(tmp_path, trained):
    from madrona_basketball_tpu.utils.checkpoint import (load_agent,
                                                         save_agent)
    net, ts0, ts, _ = trained
    path = str(tmp_path / "agent.ckpt")
    save_agent(ts.agent, path)
    loaded = load_agent(path)
    for a, b in zip(jax.tree.leaves(ts.agent), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frozen_selfplay_iteration_runs():
    hp = PPOParams(num_envs=8, num_rollout_steps=4, num_minibatches=2,
                   update_epochs=1, use_frozen=True, trainee_idx=0)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = T.init_train_state(CFG, hp, net, jax.random.PRNGKey(5))
    it = T.make_train_iteration(CFG, hp, net)
    ts, metrics = it(ts)
    assert np.isfinite(float(metrics["adv_abs_mean"]))
