"""Unit tests for trainer plumbing added with the chunked-dispatch and
super-row-shuffle optimizations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo.train import (auto_chunk,
                                              make_minibatch_update,
                                              unstack_metrics)


def test_auto_chunk():
    assert auto_chunk(100, 100) == 50
    assert auto_chunk(100, 25) == 25
    assert auto_chunk(10, 20) == 10
    assert auto_chunk(7, 13) == 1
    assert auto_chunk(100, 100, cap=10) == 10
    assert auto_chunk(1, 1) == 1


def test_unstack_metrics_roundtrip():
    stacked = {"a": jnp.arange(6).reshape(3, 2), "b": jnp.ones((3,))}
    ms = unstack_metrics(stacked, 3)
    assert len(ms) == 3
    np.testing.assert_array_equal(np.asarray(ms[1]["a"]), [2, 3])
    assert float(ms[2]["b"]) == 1.0


def _toy_update(G):
    """Run the shared minibatch update on a toy quadratic objective."""
    hp = PPOParams(num_envs=8, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=2, shuffle_block=G)
    total = hp.rollout_batch_size
    key = jax.random.PRNGKey(0)
    buf = {
        "obs": jax.random.normal(key, (total, 4)),
        "actions": jnp.zeros((total, 2), jnp.int32),
        "log_probs": jnp.zeros((total,)),
    }
    adv = jax.random.normal(jax.random.fold_in(key, 1), (total,))
    update = make_minibatch_update(hp)

    def grad_step(carry, o, a, lp, v, advb, ret):
        params, opt_state = carry
        # "gradient" of a toy objective linear in params: the update sum
        # over an epoch is invariant to the minibatch partition
        g = jnp.mean(o.sum(-1) * advb)
        return params - 0.1 * g, opt_state

    params, _ = update(grad_step, jnp.zeros(()), None, buf, adv,
                       jnp.zeros((total,)), jnp.zeros((total,)),
                       jax.random.PRNGKey(7))
    return float(params)


def test_minibatch_update_blocked_vs_exact():
    """Super-row shuffle must not change the SUM of minibatch gradients
    within an epoch (partition invariance of the mean over the union):
    with the toy linear objective the final parameter depends only on
    per-minibatch means, so G=8 and G=1 agree to reordering noise."""
    p1 = _toy_update(1)
    p8 = _toy_update(8)
    # Both apply 4 gradient steps of minibatch means whose overall sum
    # per epoch is the full-batch mean; totals agree exactly for a
    # linear-in-params objective.
    np.testing.assert_allclose(p1, p8, rtol=1e-5)


def test_run_epochs_visits_every_sample_each_epoch():
    """The prebuilt-feat epoch runner must present EVERY sample exactly
    once per epoch (a permutation partitions the batch).  Verified by
    accumulating sum and sum-of-squares of unique sample ids delivered
    to grad_step across each epoch."""
    hp = PPOParams(num_envs=8, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=3, shuffle_block=4)
    total = hp.rollout_batch_size
    ids = jnp.arange(total, dtype=jnp.float32)
    feat = jnp.zeros((total, 8)).at[:, 7].set(ids)
    update = make_minibatch_update(hp)

    def grad_step(carry, o, a, lp, v, advb, ret):
        (s, s2, n), opt = carry
        return ((s + ret.sum(), s2 + (ret ** 2).sum(),
                 n + ret.shape[0]), opt)

    (s, s2, n), _ = update.run_epochs(grad_step, (0.0, 0.0, 0), None,
                                      feat, 4, 2, jax.random.PRNGKey(3))
    epochs = hp.update_epochs
    np.testing.assert_allclose(float(s), epochs * float(ids.sum()),
                               rtol=1e-6)
    np.testing.assert_allclose(float(s2), epochs * float((ids ** 2).sum()),
                               rtol=1e-6)
    assert int(n) == epochs * total


def test_rms_update_padded_matches_full():
    """rms_update_padded == rms_update on the explicitly zero-padded
    batch (structural obs tail, constants.OBS_USED)."""
    from madrona_basketball_tpu.models.normalize import (
        RMSState, rms_update, rms_update_padded)
    rng = np.random.RandomState(0)
    st = RMSState(mean=jnp.asarray(rng.normal(size=12), jnp.float32),
                  var=jnp.asarray(rng.uniform(0.5, 2, 12), jnp.float32),
                  count=jnp.asarray(37.0))
    x = jnp.asarray(rng.normal(size=(50, 8)), jnp.float32)
    full = rms_update(st, jnp.pad(x, ((0, 0), (0, 4))))
    packed = rms_update_padded(st, x)
    np.testing.assert_allclose(np.asarray(packed.mean),
                               np.asarray(full.mean), atol=1e-6)
    np.testing.assert_allclose(np.asarray(packed.var),
                               np.asarray(full.var), atol=1e-6)
    np.testing.assert_allclose(float(packed.count), float(full.count))


def test_packed_obs_update_matches_full_width():
    """The packed-feat update (obs columns = OBS_USED, sliced Dense_0
    kernel) must produce the SAME parameters as the generic full-width
    update on zero-padded observations — dropping structurally-zero
    inputs is an identity on the network and its gradients."""
    from madrona_basketball_tpu import constants as C
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.train import (make_optimizer,
                                                  make_update_fns)

    hp = PPOParams(num_envs=4, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=2, shuffle_block=1)
    total = hp.rollout_batch_size
    net, ap = init_agent(jax.random.PRNGKey(0))
    tx = make_optimizer(hp)
    opt_state = tx.init(ap.params)
    rng = np.random.RandomState(5)
    used = C.OBS_USED
    obs_used = jnp.asarray(rng.normal(size=(total, used)), jnp.float32)
    obs_full = jnp.pad(obs_used, ((0, 0), (0, C.OBS_SIZE - used)))
    actions = jnp.asarray(rng.randint(0, 2, (total, 6)), jnp.int32)
    lp = jnp.asarray(rng.normal(size=(total,)) * 0.1, jnp.float32)
    vn = jnp.asarray(rng.normal(size=(total,)), jnp.float32)
    adv = jnp.asarray(rng.normal(size=(total,)), jnp.float32)
    rn = jnp.asarray(rng.normal(size=(total,)), jnp.float32)
    key = jax.random.PRNGKey(9)

    _, update_policy = make_update_fns(hp, net)
    buf = dict(obs=obs_full, actions=actions, log_probs=lp)
    agent_full, _ = update_policy(ap, opt_state, buf, adv, vn, rn, key)

    feat = jnp.concatenate([
        obs_used, actions.astype(jnp.float32), lp[:, None], vn[:, None],
        adv[:, None], rn[:, None]], axis=-1)
    agent_packed, _ = update_policy.with_feat(ap, opt_state, feat, used,
                                              6, key)
    for a, b in zip(jax.tree_util.tree_leaves(agent_full.params),
                    jax.tree_util.tree_leaves(agent_packed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_shuffle_block_warns_when_not_dividing():
    hp = PPOParams(num_envs=8, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=1, shuffle_block=7)
    with pytest.warns(UserWarning, match="shuffle_block=7"):
        make_minibatch_update(hp)


def test_enable_compile_cache_honors_env(monkeypatch, tmp_path):
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "env"))
    before = jax.config.jax_compilation_cache_dir
    enable_compile_cache(str(tmp_path / "explicit"))
    # env var wins: the helper must not override it
    assert jax.config.jax_compilation_cache_dir == before
