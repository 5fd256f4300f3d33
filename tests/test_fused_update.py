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


# ---- scalar-prefetch kernel: permuted blocks stream straight from the
# trajectory buffer (no materialized epoch gather) ----

from madrona_basketball_tpu.ops import fused_rollout as FR  # noqa: E402
from madrona_basketball_tpu.ops import fused_update as FU  # noqa: E402


def _make_traj_side(rng, T, W):
    """Random trajectory + side arrays in the rollout kernel's layout."""
    buckets = list(C.ACTION_BUCKETS)
    traj = rng.normal(scale=3.0,
                      size=(T, FR.ROLL_ROWS, W)).astype(np.float32)
    for j, n in enumerate(buckets):
        traj[:, FR.R_ACT + j, :] = rng.randint(
            0, n, (T, W)).astype(np.float32)
    traj[:, FR.R_LOGP, :] = rng.normal(
        scale=0.3, size=(T, W)).astype(np.float32)
    side = rng.normal(size=(T, FU.SIDE_ROWS, W)).astype(np.float32)
    return jnp.asarray(traj), jnp.asarray(side)


def _gather_blocks(traj, side, idx, wb, wblk):
    """Reference assembly of a minibatch from block ids (row-major)."""
    tj, sd = np.asarray(traj), np.asarray(side)
    cols_t = [tj[b // wblk, :, (b % wblk) * wb:(b % wblk + 1) * wb]
              for b in np.asarray(idx)]
    cols_s = [sd[b // wblk, :, (b % wblk) * wb:(b % wblk + 1) * wb]
              for b in np.asarray(idx)]
    blk = np.concatenate(cols_t, axis=1)     # (ROWS, mb)
    s = np.concatenate(cols_s, axis=1)       # (SIDE_ROWS, mb)
    return (jnp.asarray(blk[:D].T), jnp.asarray(blk[D:D + 6].T, np.int32),
            jnp.asarray(blk[FR.R_LOGP]), jnp.asarray(s[FU.SIDE_VALUE]),
            jnp.asarray(s[FU.SIDE_ADV]), jnp.asarray(s[FU.SIDE_RET]))


def test_prefetch_grad_matches_autodiff():
    """grad(prefetch kernel over permuted blocks) == jax.grad of the loss
    on the explicitly gathered minibatch."""
    hp = PPOParams(num_envs=16, num_rollout_steps=4, num_minibatches=2,
                   update_epochs=1)
    T, W, wb = 4, 16, 4
    wblk = W // wb
    bpm = hp.minibatch_size // wb
    net, ap = init_agent(jax.random.PRNGKey(7))
    rng = np.random.RandomState(7)
    ap = ap.replace(obs_rms=rms_update(
        ap.obs_rms,
        jnp.asarray(rng.normal(1.0, 2.0, (256, C.OBS_SIZE)), F32)))
    traj, side = _make_traj_side(rng, T, W)
    idx = jnp.asarray(rng.permutation(T * wblk)[:bpm], jnp.int32)

    o, a, lp, v, adv, ret = _gather_blocks(traj, side, idx, wb, wblk)
    _, update_policy = make_update_fns(hp, net)
    ref, _aux = jax.grad(update_policy.loss_fn, has_aux=True)(
        ap.params, ap, o, a, lp, v, adv, ret)

    grad_fn = FU.make_fused_minibatch_grad_prefetch(hp, D, T, W, wb,
                                                    interpret=True)
    nrm = pack_norm(ap.obs_rms, D)
    w1, w2, wh, bias = pack_weights(ap.params, D)
    dw1, dw2, dwh, dbias = grad_fn(idx, traj, side, nrm, w1, w2, wh, bias)
    got = grads_to_tree(ap.params, dw1, dw2, dwh, dbias, D)

    ref_leaves, ref_def = jax.tree_util.tree_flatten(ref)
    got_leaves, got_def = jax.tree_util.tree_flatten(got)
    assert ref_def == got_def
    for i, (r, g) in enumerate(zip(ref_leaves, got_leaves)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-6, err_msg=f"grad leaf {i}")


def test_prefetch_update_matches_autodiff_loop():
    """Full epochs x minibatches through the scalar-prefetch kernel ==
    an explicit gather + autodiff loop over the SAME block permutations
    (the equivalence the trainer's update_policy_traj relies on)."""
    import optax

    from madrona_basketball_tpu.ppo.train import make_optimizer

    hp = PPOParams(num_envs=16, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=2)
    T, W, wb = 8, 16, 4
    wblk = W // wb
    n_blocks = T * wblk
    bpm = hp.minibatch_size // wb
    net, ap = init_agent(jax.random.PRNGKey(9))
    rng = np.random.RandomState(9)
    ap = ap.replace(obs_rms=rms_update(
        ap.obs_rms,
        jnp.asarray(rng.normal(0.5, 1.5, (128, C.OBS_SIZE)), F32)))
    traj, side = _make_traj_side(rng, T, W)
    tx = make_optimizer(hp)
    key = jax.random.PRNGKey(17)
    perms = jnp.argsort(
        jax.random.bits(key, (hp.update_epochs, n_blocks), jnp.uint32),
        axis=1).astype(jnp.int32)

    # ---- prefetch-kernel path ----
    mbg = FU.make_fused_minibatch_grad_prefetch(hp, D, T, W, wb,
                                                interpret=True)
    nrm = pack_norm(ap.obs_rms, D)
    params_k, opt_k = ap.params, tx.init(ap.params)
    for e in range(hp.update_epochs):
        for m in range(hp.num_minibatches):
            idx = perms[e, m * bpm:(m + 1) * bpm]
            w1, w2, wh, bias = pack_weights(params_k, D)
            dw1, dw2, dwh, dbias = mbg(idx, traj, side, nrm, w1, w2, wh,
                                       bias)
            grads = grads_to_tree(params_k, dw1, dw2, dwh, dbias, D)
            updates, opt_k = tx.update(grads, opt_k, params_k)
            params_k = optax.apply_updates(params_k, updates)

    # ---- explicit gather + autodiff over the same permutations ----
    _, update_policy = make_update_fns(hp, net)
    grad_fn = jax.grad(update_policy.loss_fn, has_aux=True)
    params_r, opt_r = ap.params, tx.init(ap.params)
    for e in range(hp.update_epochs):
        for m in range(hp.num_minibatches):
            idx = perms[e, m * bpm:(m + 1) * bpm]
            o, a, lp, v, adv, ret = _gather_blocks(traj, side, idx, wb,
                                                   wblk)
            grads, _ = grad_fn(params_r, ap, o, a, lp, v, adv, ret)
            updates, opt_r = tx.update(grads, opt_r, params_r)
            params_r = optax.apply_updates(params_r, updates)

    for r, g in zip(jax.tree_util.tree_leaves(params_r),
                    jax.tree_util.tree_leaves(params_k)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=1e-5)


def _phase_compare(hp, T, W, wb, seed):
    """The ONE-LAUNCH update phase (all epochs x minibatches with
    in-kernel global-norm clip + Adam) == the explicit jax.grad + optax
    chain over the same block permutations — params, mu, nu, and count,
    including a SECOND phase continuing from the first's state (nonzero
    Adam count exercises the bias-correction path)."""
    import optax

    from madrona_basketball_tpu.ppo.train import make_optimizer

    wblk = W // wb
    n_blocks = T * wblk
    bpm = hp.minibatch_size // wb
    n_updates = hp.update_epochs * hp.num_minibatches
    net, ap = init_agent(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    ap = ap.replace(obs_rms=rms_update(
        ap.obs_rms,
        jnp.asarray(rng.normal(0.5, 1.5, (128, C.OBS_SIZE)), F32)))
    tx = make_optimizer(hp)
    opt_state = tx.init(ap.params)
    nrm = pack_norm(ap.obs_rms, D)
    _, update_policy = make_update_fns(hp, net)
    grad_fn = jax.grad(update_policy.loss_fn, has_aux=True)

    ufp = FU.make_fused_update_phase(hp, D, T, W, wb, interpret=True)

    params_r, opt_r = ap.params, opt_state
    params_k = ap.params
    clip_s, (adam_k, scale_s) = opt_state

    for phase in range(2):
        traj, side = _make_traj_side(rng, T, W)
        perms = jnp.argsort(
            jax.random.bits(jax.random.PRNGKey(50 + phase),
                            (hp.update_epochs, n_blocks), jnp.uint32),
            axis=1).astype(jnp.int32)

        # ---- one kernel launch ----
        out = ufp(perms.reshape(-1), adam_k.count, traj, side, nrm,
                  *pack_weights(params_k, D),
                  *pack_weights(adam_k.mu, D),
                  *pack_weights(adam_k.nu, D))
        params_k = FU.unpack_weights(params_k, *out[0:4], D)
        adam_k = adam_k._replace(
            count=adam_k.count + n_updates,
            mu=FU.unpack_weights(adam_k.mu, *out[4:8], D),
            nu=FU.unpack_weights(adam_k.nu, *out[8:12], D))

        # ---- explicit reference ----
        for e in range(hp.update_epochs):
            for m in range(hp.num_minibatches):
                idx = perms[e, m * bpm:(m + 1) * bpm]
                o, a, lp, v, adv, ret = _gather_blocks(traj, side, idx,
                                                       wb, wblk)
                grads, _ = grad_fn(params_r, ap, o, a, lp, v, adv, ret)
                updates, opt_r = tx.update(grads, opt_r, params_r)
                params_r = optax.apply_updates(params_r, updates)

        adam_r = opt_r[1][0]
        assert int(adam_k.count) == int(adam_r.count), phase
        for name, got, want in (("params", params_k, params_r),
                                ("mu", adam_k.mu, adam_r.mu),
                                ("nu", adam_k.nu, adam_r.nu)):
            for i, (g, r) in enumerate(zip(jax.tree.leaves(got),
                                           jax.tree.leaves(want))):
                np.testing.assert_allclose(
                    np.asarray(g), np.asarray(r), atol=2e-6,
                    err_msg=f"phase {phase} {name} leaf {i}")


def test_fused_update_phase_matches_optax():
    hp = PPOParams(num_envs=16, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=2)
    _phase_compare(hp, T=8, W=16, wb=4, seed=13)


def test_fused_update_phase_wb_equals_w():
    """wb == W (wblk == 1): the geometry small-world runs hit (e.g. the
    512-env convergence overlay, where pick_update_block(512, 4096) ==
    512) — every permuted block is a full-width tick slice."""
    hp = PPOParams(num_envs=8, num_rollout_steps=4, num_minibatches=2,
                   update_epochs=2)
    _phase_compare(hp, T=4, W=8, wb=8, seed=21)


def test_pack_unpack_roundtrip():
    _, ap = init_agent(jax.random.PRNGKey(4))
    mats = pack_weights(ap.params, D)
    back = FU.unpack_weights(ap.params, *mats, D)
    for g, r in zip(jax.tree.leaves(back), jax.tree.leaves(ap.params)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_pick_update_block():
    assert FU.pick_update_block(8192, 65536) == 4096
    assert FU.pick_update_block(8192, 65536, cap=2048) == 2048
    assert FU.pick_update_block(512, 4096) == 512
    assert FU.pick_update_block(16, 32) == 16
    assert FU.pick_update_block(24, 96) == 8
