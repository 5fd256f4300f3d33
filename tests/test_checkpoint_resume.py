"""Full train-state checkpoint/resume via Orbax — the capability the
reference lacks (it saves only network weights; optimizer/env/iteration are
lost, SURVEY §5)."""

import jax
import numpy as np

from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo import train_fused as TF
from madrona_basketball_tpu.utils.checkpoint import (restore_train_state,
                                                     save_train_state)

CFG = SimConfig()
HP = PPOParams(num_envs=8, num_rollout_steps=4, num_minibatches=2,
               update_epochs=1)


def test_orbax_full_state_resume(tmp_path):
    net, _ = init_agent(jax.random.PRNGKey(0))
    it = TF.make_train_iteration_fused(CFG, HP, net, backend="xla")

    ts = TF.init_fused_train_state(CFG, HP, net, jax.random.PRNGKey(7))
    ts, _ = it(ts)
    ts, _ = it(ts)

    path = str(tmp_path / "ckpt")
    save_train_state(ts, path)

    template = jax.tree.map(np.zeros_like, jax.device_get(ts))
    restored = restore_train_state(template, path)

    # Resume must continue bit-identically to the uninterrupted run.
    cont_a, m_a = it(ts)
    cont_b, m_b = it(jax.tree.map(lambda x: jax.numpy.asarray(x), restored))
    for a, b in zip(jax.tree.leaves(cont_a.agent.params),
                    jax.tree.leaves(cont_b.agent.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(cont_b.iteration) == 3
