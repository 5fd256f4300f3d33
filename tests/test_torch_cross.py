"""Trainer cross-validation against an independent PyTorch stack
(VERDICT round-1 item 6): the reference-recipe torch PPO
(crosscheck/torch_ppo.py) and the JAX trainers must produce the same
GAE / normalizer / update numerics when fed the SAME trajectories and
the SAME initial weights — and the torch loop must actually train
against the native C++ engine."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo.train import (make_optimizer,
                                              make_update_fns)
from madrona_basketball_tpu.crosscheck.torch_ppo import (
    TorchAgent, compute_advantages_torch, update_policy_torch)
from madrona_basketball_tpu.utils.torch_compat import (
    agent_params_from_torch_state_dict)

F32 = jnp.float32


def _random_buffer(rng, T, N):
    buckets = list(C.ACTION_BUCKETS)
    obs = rng.normal(scale=3.0, size=(T, N, C.OBS_SIZE)).astype(np.float32)
    obs[:, :, C.OBS_USED:] = 0.0  # structural zero tail
    actions = np.stack([rng.randint(0, n, (T, N)) for n in buckets],
                       axis=-1).astype(np.int32)
    return dict(
        obs=obs,
        actions=actions,
        log_probs=rng.normal(scale=0.2, size=(T, N)).astype(np.float32),
        values=rng.normal(size=(T, N)).astype(np.float32),
        rewards=rng.normal(size=(T, N)).astype(np.float32),
        not_dones=(rng.uniform(size=(T, N)) > 0.1).astype(np.float32),
        next_value=rng.normal(size=(N,)).astype(np.float32),
    )


def test_weight_roundtrip_flax_torch_flax():
    _, ap = init_agent(jax.random.PRNGKey(4))
    tagent = TorchAgent.from_agent_params(ap)
    back = agent_params_from_torch_state_dict(tagent.state_dict())
    for a, b in zip(jax.tree_util.tree_leaves(ap.params),
                    jax.tree_util.tree_leaves(back.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_forward_matches_torch():
    """Same weights + same obs -> same logits/value in both stacks."""
    net, ap = init_agent(jax.random.PRNGKey(1))
    tagent = TorchAgent.from_agent_params(ap)
    rng = np.random.RandomState(0)
    obs = rng.normal(scale=4.0, size=(64, C.OBS_SIZE)).astype(np.float32)

    from madrona_basketball_tpu.models.normalize import rms_normalize
    x = rms_normalize(ap.obs_rms, jnp.asarray(obs), clamp=5.0)
    logits_j, value_j = net.apply(ap.params, x)

    with torch.no_grad():
        x_t = tagent._trunk(torch.from_numpy(obs))
        logits_t = tagent.actor(x_t).numpy()
        value_t = tagent.critic(x_t).squeeze(-1).numpy()
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(value_j), value_t, atol=2e-5)


def test_update_numerics_match_torch_on_same_trajectories():
    """One full advantage+update pass on identical trajectories and
    identical initial weights: advantages, normalized values/returns,
    normalizer states, and the post-update parameters must agree
    between the torch recipe and make_update_fns.  num_minibatches=1
    makes the pass permutation-independent, isolating the numerics from
    RNG-stream differences."""
    T, N = 8, 32
    hp = PPOParams(num_envs=N, num_rollout_steps=T, num_minibatches=1,
                   update_epochs=2, shuffle_block=1)
    net, ap = init_agent(jax.random.PRNGKey(2))
    rng = np.random.RandomState(7)
    buf_np = _random_buffer(rng, T, N)

    # ---- JAX ----
    buf_j = {k: jnp.asarray(v) for k, v in buf_np.items()}
    ca, up = make_update_fns(hp, net)
    tx = make_optimizer(hp)
    opt_state = tx.init(ap.params)
    agent_j, adv_j, vn_j, rn_j = jax.jit(ca)(ap, buf_j)
    agent_j, _ = jax.jit(up)(agent_j, opt_state, buf_j, adv_j, vn_j, rn_j,
                             jax.random.PRNGKey(3))

    # ---- torch ----
    tagent = TorchAgent.from_agent_params(ap)
    topt = torch.optim.Adam(tagent.parameters(), lr=hp.learning_rate,
                            eps=1e-8)
    buf_t = {k: torch.from_numpy(v.astype(np.float32))
             if k != "actions" else torch.from_numpy(v).long()
             for k, v in buf_np.items()}
    adv_t, vn_t, rn_t = compute_advantages_torch(tagent, buf_t, hp.gamma,
                                                 hp.gae_lambda)
    np.testing.assert_allclose(np.asarray(adv_j), adv_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vn_j), vn_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(rn_j), rn_t.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(agent_j.obs_rms.mean),
                               tagent.obs_norm.mean.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(agent_j.obs_rms.var),
                               tagent.obs_norm.var.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(agent_j.value_rms.mean),
                               tagent.value_norm.mean.numpy(), atol=1e-4)

    update_policy_torch(tagent, topt, buf_t, adv_t, vn_t, rn_t, hp)
    back = agent_params_from_torch_state_dict(tagent.state_dict())
    leaves_j = jax.tree_util.tree_leaves(agent_j.params)
    leaves_t = jax.tree_util.tree_leaves(back.params)
    assert len(leaves_j) == len(leaves_t)
    for a, b in zip(leaves_j, leaves_t):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_torch_ppo_trains_on_native_engine():
    """The reference-recipe torch loop drives the native C++ executor
    end to end: losses stay finite, episodes complete, parameters move."""
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.crosscheck.torch_ppo import train
    hp = PPOParams(num_envs=32, num_rollout_steps=16, num_minibatches=2,
                   update_epochs=1)
    agent = TorchAgent()
    w0 = agent.actor.weight.detach().clone()
    # short game clock so episodes complete within the smoke budget
    agent, history = train(num_envs=32, num_iterations=3, seed=1,
                           cfg=SimConfig(time_per_period=0.5),
                           agent=agent, log_every=1, hp=hp)
    assert len(history) == 3
    assert all(np.isfinite(h["mean_reward"]) for h in history)
    assert history[-1]["episodes"] > 0, "no episodes completed"
    assert not torch.equal(agent.actor.weight, w0), "no learning step"
    for p in agent.parameters():
        assert torch.isfinite(p).all()
