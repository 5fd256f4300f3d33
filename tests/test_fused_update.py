"""Hand-derived Pallas minibatch gradient == jax.grad of the PPO loss.

The fused update kernel (ops/fused_update.py) computes the full
parameter gradient of make_update_fns' loss with a manual backward
pass; this pins it against autodiff of the exact same (packed-obs,
sliced-kernel) loss, leaf for leaf, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.models.normalize import rms_update
from madrona_basketball_tpu.ops.fused_update import (
    grads_to_tree, make_fused_minibatch_grad, pack_norm, pack_weights)
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo.train import make_update_fns

F32 = jnp.float32
D = C.OBS_USED


def _make_feat(rng, mb):
    buckets = list(C.ACTION_BUCKETS)
    obs = rng.normal(scale=3.0, size=(mb, D)).astype(np.float32)
    actions = np.stack([rng.randint(0, n, mb) for n in buckets],
                       axis=-1).astype(np.float32)
    lp = rng.normal(scale=0.3, size=(mb, 1)).astype(np.float32)
    v = rng.normal(size=(mb, 1)).astype(np.float32)
    adv = rng.normal(size=(mb, 1)).astype(np.float32)
    ret = rng.normal(size=(mb, 1)).astype(np.float32)
    return jnp.asarray(np.concatenate(
        [obs, actions, lp, v, adv, ret], axis=-1))


def _grad_compare(hp, seed, atol):
    mb = hp.minibatch_size
    net, ap = init_agent(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    # non-trivial normalizer stats
    ap = ap.replace(obs_rms=rms_update(
        ap.obs_rms,
        jnp.asarray(rng.normal(1.0, 2.0, (256, C.OBS_SIZE)), F32)))
    feat = _make_feat(rng, mb)

    _, update_policy = make_update_fns(hp, net)
    loss_fn = update_policy.loss_fn
    o = feat[:, :D]
    a = feat[:, D:D + 6].astype(jnp.int32)
    ref, _aux = jax.grad(loss_fn, has_aux=True)(
        ap.params, ap, o, a, feat[:, D + 6], feat[:, D + 7],
        feat[:, D + 8], feat[:, D + 9])

    grad_fn = make_fused_minibatch_grad(hp, D, mb, block_rows=mb // 2,
                                        interpret=True)
    nrm = pack_norm(ap.obs_rms, D)
    w1, w2, wh, bias = pack_weights(ap.params, D)
    dw1, dw2, dwh, dbias = grad_fn(feat, nrm, w1, w2, wh, bias)
    got = grads_to_tree(ap.params, dw1, dw2, dwh, dbias, D)

    ref_leaves, ref_def = jax.tree_util.tree_flatten(ref)
    got_leaves, got_def = jax.tree_util.tree_flatten(got)
    assert ref_def == got_def
    for i, (r, g) in enumerate(zip(ref_leaves, got_leaves)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=atol,
            err_msg=f"grad leaf {i} ({jax.tree_util.tree_structure(ref)})")


def test_fused_grad_matches_autodiff():
    hp = PPOParams(num_envs=16, num_rollout_steps=16, num_minibatches=1,
                   update_epochs=1)
    _grad_compare(hp, seed=0, atol=2e-6)


def test_fused_grad_matches_autodiff_no_vclip():
    hp = PPOParams(num_envs=16, num_rollout_steps=16, num_minibatches=1,
                   update_epochs=1, clip_vloss=False)
    _grad_compare(hp, seed=1, atol=2e-6)


def test_fused_update_trains_like_xla():
    """Full epochs x minibatches with the kernel grad == the autodiff
    update (same permutations, same Adam chain)."""
    import optax

    from madrona_basketball_tpu.ops.fused_update import (
        make_fused_minibatch_grad, pack_norm, pack_weights)
    from madrona_basketball_tpu.ppo.train import (make_minibatch_update,
                                                  make_optimizer)

    hp = PPOParams(num_envs=8, num_rollout_steps=16, num_minibatches=2,
                   update_epochs=2, shuffle_block=1)
    total = hp.rollout_batch_size
    net, ap = init_agent(jax.random.PRNGKey(3))
    rng = np.random.RandomState(4)
    ap = ap.replace(obs_rms=rms_update(
        ap.obs_rms,
        jnp.asarray(rng.normal(0.5, 1.5, (128, C.OBS_SIZE)), F32)))
    feat = _make_feat(rng, total)
    tx = make_optimizer(hp)
    opt_state = tx.init(ap.params)
    key = jax.random.PRNGKey(11)

    _, update_policy = make_update_fns(hp, net)
    agent_ref, _ = update_policy.with_feat(ap, opt_state, feat, D, 6, key)

    mbg = make_fused_minibatch_grad(hp, D, hp.minibatch_size,
                                    block_rows=hp.minibatch_size // 2,
                                    interpret=True)
    nrm = pack_norm(ap.obs_rms, D)
    mb_update = make_minibatch_update(hp)

    def raw_grad_step(carry, fe):
        params, opt_state = carry
        w1, w2, wh, bias = pack_weights(params, D)
        dw1, dw2, dwh, dbias = mbg(fe, nrm, w1, w2, wh, bias)
        grads = grads_to_tree(params, dw1, dw2, dwh, dbias, D)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    params, _ = mb_update.run_epochs(raw_grad_step, ap.params, opt_state,
                                     feat, D, 6, key, raw_feat=True)
    for r, g in zip(jax.tree_util.tree_leaves(agent_ref.params),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-5)
