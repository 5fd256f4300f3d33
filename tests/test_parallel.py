"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_basketball_tpu import engine
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.parallel.mesh import (make_mesh, shard_env_state,
                                                  shard_train_state)
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo import train as T

CFG = SimConfig()


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_env_step_matches_unsharded():
    mesh = make_mesh()
    state = engine.init_batch(CFG, jax.random.PRNGKey(0), 16)
    step = engine.make_step_fn(CFG)

    ref = state
    for _ in range(3):
        ref = step(ref)

    sharded = shard_env_state(state, mesh)
    out = sharded
    for _ in range(3):
        out = step(out)

    np.testing.assert_allclose(np.asarray(out.agents.obs),
                               np.asarray(ref.agents.obs), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.ball.holder),
                                  np.asarray(ref.ball.holder))
    # world axis is actually distributed
    shardings = out.agents.pos.sharding
    assert len(shardings.device_set) == 8


def test_sharded_train_iteration_matches_unsharded():
    hp = PPOParams(num_envs=16, num_rollout_steps=4, num_minibatches=2,
                   update_epochs=1)
    net, _ = init_agent(jax.random.PRNGKey(0))
    it = T.make_train_iteration(CFG, hp, net)

    ts = T.init_train_state(CFG, hp, net, jax.random.PRNGKey(3))
    ref, ref_metrics = it(ts)

    mesh = make_mesh()
    ts_sharded = shard_train_state(
        T.init_train_state(CFG, hp, net, jax.random.PRNGKey(3)), mesh)
    out, metrics = it(ts_sharded)

    for a, b in zip(jax.tree.leaves(ref.agent.params),
                    jax.tree.leaves(out.agent.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(float(ref_metrics["adv_abs_mean"]),
                               float(metrics["adv_abs_mean"]), atol=1e-4)


def test_sharded_fused_trainer_matches_unsharded():
    """Fused trainer under shard_map (worlds split over 8 devices) == the
    single-device fused trainer."""
    from madrona_basketball_tpu.parallel.mesh import shard_fused_train_state
    from madrona_basketball_tpu.ppo import train_fused as TF

    hp = PPOParams(num_envs=16, num_rollout_steps=4, num_minibatches=2,
                   update_epochs=1)
    net, _ = init_agent(jax.random.PRNGKey(0))

    ts_ref = TF.init_fused_train_state(CFG, hp, net, jax.random.PRNGKey(3))
    it_ref = TF.make_train_iteration_fused(CFG, hp, net, backend="xla")
    ref, m_ref = it_ref(ts_ref)

    mesh = make_mesh()
    ts_sh = shard_fused_train_state(
        TF.init_fused_train_state(CFG, hp, net, jax.random.PRNGKey(3)),
        mesh)
    it_sh = TF.make_train_iteration_fused(CFG, hp, net, backend="xla",
                                          mesh=mesh)
    out, m_sh = it_sh(ts_sh)

    for a, b in zip(jax.tree.leaves(ref.agent.params),
                    jax.tree.leaves(out.agent.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(float(m_ref["adv_abs_mean"]),
                               float(m_sh["adv_abs_mean"]), atol=1e-4)


def test_dryrun_multichip_entry():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
