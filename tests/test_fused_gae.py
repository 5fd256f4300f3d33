"""Fused GAE kernel (ops/fused_gae.py) vs the unfused XLA pipeline.

The kernel must reproduce, in one pass, what the flagship trainer's XLA
segment does between the rollout and update kernels: value
unnormalization, the reverse GAE recursion with the reference's
t == T-1 boundary quirk (scripts/ppo.py:156-161), the side-array
assembly, and — via its block moments + Chan combine — the exact
normalizer/advantage statistics the update consumes."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_basketball_tpu.models.normalize import (EPS, RMSState,
                                                     _rms_merge,
                                                     rms_normalize,
                                                     rms_update)
from madrona_basketball_tpu.ops import fused_gae as FG
from madrona_basketball_tpu.ops import fused_update as FU
from madrona_basketball_tpu.ops.gae import compute_gae

F32 = jnp.float32


def _mk_inputs(T, W, seed=0):
    rng = np.random.RandomState(seed)
    values_n = jnp.asarray(rng.uniform(-6, 6, (T, W)), F32)
    rewards = jnp.asarray(rng.uniform(-120, 20, (T, W)), F32)
    done = jnp.asarray((rng.uniform(size=(T, W)) < 0.05), F32)
    next_value_n = jnp.asarray(rng.uniform(-6, 6, (W,)), F32)
    vrm = RMSState(mean=jnp.asarray([-80.0]), var=jnp.asarray([900.0]),
                   count=jnp.asarray(5000.0))
    return values_n, rewards, done, next_value_n, vrm


def _unnorm(vrm, x):
    return vrm.mean[0] + jnp.sqrt(vrm.var[0] + EPS) * jnp.clip(x, -5, 5)


def test_fused_gae_matches_xla_pipeline():
    T, W = 8, 256
    gamma, lam = 0.998, 0.95
    ROWS, RV, RR, RD = 16, 3, 5, 7
    values_n, rewards, done, next_value_n, vrm = _mk_inputs(T, W)
    rng = np.random.RandomState(9)
    traj = jnp.asarray(rng.uniform(-4, 4, (T, ROWS, W)), F32)
    traj = traj.at[:, RV, :].set(values_n)
    traj = traj.at[:, RR, :].set(rewards)
    traj = traj.at[:, RD, :].set(done)
    carry = jnp.asarray(rng.uniform(0, 50, (2, W)), F32)

    gk = FG.make_fused_gae(T, W, gamma, lam, RV, RR, RD, interpret=True)
    vstats = jnp.concatenate(
        [vrm.mean[0].reshape(1, 1),
         jnp.sqrt(vrm.var[0] + EPS).reshape(1, 1),
         jnp.zeros((1, FG.VSTAT_COLS - 2), F32)], axis=1)
    side, moments, carry_out, ticks = gk(traj, carry,
                                         next_value_n[None, :], vstats)

    # ---- reference pipeline ----
    values_un = _unnorm(vrm, values_n)
    next_un = _unnorm(vrm, next_value_n)
    adv, ret = compute_gae(rewards, values_un, 1.0 - done, next_un,
                           gamma, lam)

    np.testing.assert_allclose(np.asarray(side[:, FU.SIDE_VALUE, :]),
                               np.asarray(values_un), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(side[:, FU.SIDE_ADV, :]),
                               np.asarray(adv), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(side[:, FU.SIDE_RET, :]),
                               np.asarray(ret), rtol=1e-5, atol=1e-3)
    assert np.all(np.asarray(side[:, 3:, :]) == 0.0)

    # ---- statistics: Chan-combined block moments == full-batch ----
    n_per = float(T * gk.gb)
    for col, x in ((0, values_un), (2, adv), (4, ret)):
        mean_b, var_b, nN = FG.combine_block_moments(
            moments[:, col], moments[:, col + 1], n_per)
        assert float(nN) == T * W
        np.testing.assert_allclose(float(mean_b), float(x.mean()),
                                   rtol=1e-5, atol=1e-3)
        np.testing.assert_allclose(float(var_b),
                                   float(x.std(ddof=1) ** 2),
                                   rtol=1e-4, atol=1e-3)

    # ---- the value_rms the moments produce == two rms_update calls ----
    vm_b, vv_b, nN = FG.combine_block_moments(moments[:, 0],
                                              moments[:, 1], n_per)
    rm_b, rv_b, _ = FG.combine_block_moments(moments[:, 4],
                                             moments[:, 5], n_per)
    merged = _rms_merge(vrm, vm_b.reshape(1), vv_b.reshape(1), nN)
    merged = _rms_merge(merged, rm_b.reshape(1), rv_b.reshape(1), nN)
    ref = rms_update(vrm, values_un.reshape(-1, 1))
    ref = rms_update(ref, ret.reshape(-1, 1))
    np.testing.assert_allclose(np.asarray(merged.mean),
                               np.asarray(ref.mean), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(merged.var),
                               np.asarray(ref.var), rtol=1e-4)
    np.testing.assert_allclose(float(merged.count), float(ref.count))

    # ---- episode stats: carry + per-tick partials == _stats_step scan --
    from madrona_basketball_tpu.ppo.train import (EpisodeStats,
                                                  _meter_update,
                                                  _stats_step)
    st0 = EpisodeStats(curr_rewards=carry[0], episode_lengths=carry[1],
                       mean_reward=jnp.asarray(-3.0),
                       reward_size=jnp.asarray(40.0),
                       mean_length=jnp.asarray(120.0),
                       length_size=jnp.asarray(40.0))
    want_st, _ = jax.lax.scan(
        lambda st, rd: (_stats_step(st, rd[0], rd[1]), None),
        st0, (rewards, done))
    per_t = jnp.sum(ticks, axis=0)

    def meter_body(st, row):
        r_mean, r_size = _meter_update(st[0], st[1], row[1], row[0])
        l_mean, l_size = _meter_update(st[2], st[3], row[2], row[0])
        return (r_mean, r_size, l_mean, l_size), None

    (r_mean, r_size, l_mean, l_size), _ = jax.lax.scan(
        meter_body, (st0.mean_reward, st0.reward_size,
                     st0.mean_length, st0.length_size), per_t)
    np.testing.assert_allclose(np.asarray(carry_out[0]),
                               np.asarray(want_st.curr_rewards),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(carry_out[1]),
                               np.asarray(want_st.episode_lengths),
                               rtol=1e-6)
    np.testing.assert_allclose(float(r_mean),
                               float(want_st.mean_reward), rtol=1e-5)
    np.testing.assert_allclose(float(r_size),
                               float(want_st.reward_size), rtol=1e-6)
    np.testing.assert_allclose(float(l_mean),
                               float(want_st.mean_length), rtol=1e-5)
    np.testing.assert_allclose(float(l_size),
                               float(want_st.length_size), rtol=1e-6)


def test_obs_moments_matches_padded_tdw():
    """make_obs_moments + rms_update_padded_moments == the two-pass
    rms_update_padded_tdw over the same trajectory obs rows."""
    from madrona_basketball_tpu.models.normalize import (
        rms_update_padded_moments, rms_update_padded_tdw)

    T, ROWS, W, used, full = 4, 16, 128, 11, 16
    rng = np.random.RandomState(3)
    traj = jnp.asarray(rng.uniform(-20, 20, (T, ROWS, W)), F32)
    st = RMSState(mean=jnp.asarray(rng.uniform(-1, 1, (full,)), F32),
                  var=jnp.asarray(rng.uniform(0.5, 2.0, (full,)), F32),
                  count=jnp.asarray(300.0))

    mom = FG.make_obs_moments(T, W, used, interpret=True)(traj)
    got = rms_update_padded_moments(st, mom[:, 0], mom[:, 1], mom[0, 2])
    want = rms_update_padded_tdw(st, traj[:, :used, :])

    assert float(mom[0, 2]) == T * W
    np.testing.assert_allclose(np.asarray(got.mean),
                               np.asarray(want.mean), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.var),
                               np.asarray(want.var), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(float(got.count), float(want.count))


def test_rollout_kernel_obs_moments():
    """The rollout kernel's in-place obs-moment accumulation
    (obs_moments=True) == two-pass moments over the trajectory obs rows
    it wrote."""
    from madrona_basketball_tpu import engine
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.engine_fused import noise_to_rows
    from madrona_basketball_tpu.models import agent as agent_lib
    from madrona_basketball_tpu.ops import layout
    from madrona_basketball_tpu.ops.fused_rollout import (
        EXT_NOISE_CHUNK, ROLL_OBS, make_fused_rollout, pack_policy)
    from madrona_basketball_tpu.ops.fused_step import fused_step_xla

    cfg = SimConfig()
    worlds, T = 256, 3
    net, agent = agent_lib.init_agent(jax.random.PRNGKey(1))
    s = engine.init_batch(cfg, jax.random.PRNGKey(4), worlds)
    sf, si = layout.pack(s)
    rng = np.random.RandomState(8)
    pre = noise_to_rows(
        jnp.asarray(rng.uniform(-1, 1, (worlds, 2, 3)), F32),
        jnp.asarray(np.concatenate(
            [rng.uniform(-1, 1, (worlds, 2)),
             rng.uniform(0, 1, (worlds, 1))], axis=1), F32))
    sf, si, obs0 = fused_step_xla(cfg, sf, si, pre)

    rollout = make_fused_rollout(cfg, worlds, T, trainee_idx=1,
                                 use_frozen=False, block=128,
                                 interpret=True, external_noise=True,
                                 obs_moments=True)
    noise = jnp.asarray(
        rng.uniform(0, 1, (T * EXT_NOISE_CHUNK, worlds)), F32)
    _, _, _, traj, mom = rollout(noise, sf, si, obs0,
                                 *pack_policy(agent))

    xo = np.asarray(traj[:, :ROLL_OBS, :])          # (T, used, W)
    mean = xo.mean(axis=(0, 2))
    m2 = ((xo - mean[None, :, None]) ** 2).sum(axis=(0, 2))
    assert float(mom[0, 2]) == T * worlds
    np.testing.assert_allclose(np.asarray(mom[:, 0]), mean, rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(mom[:, 1]), m2, rtol=1e-4,
                               atol=1e-3)


def test_fused_gae_trainer_matches_unfused():
    """Full flagship iteration with fused_gae=True == fused_gae=False
    (same seed, interpret mode).  The pin is tight after ONE iteration
    (observed max param delta ~1e-7 — pure f32 rounding); beyond that
    the ~1-ulp normalization differences can flip Gumbel-max near-ties
    and the trajectories themselves diverge, so the second iteration is
    a finiteness/continuation check only."""
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo import train_fused as TF

    cfg = SimConfig()
    hp = PPOParams(num_envs=16, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=2, use_frozen=False, trainee_idx=1)
    net, _ = init_agent(jax.random.PRNGKey(0))

    results = []
    for fg in (False, True):
        ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(7))
        it = TF.make_train_iteration_fused(cfg, hp, net, backend="xla",
                                           rollout_kernel=True,
                                           rollout_interpret=True,
                                           fused_gae=fg)
        ts, m = it(ts)
        results.append((ts, m, it))

    (ts_a, m_a, it_a), (ts_b, m_b, it_b) = results
    for a, b in zip(jax.tree.leaves(ts_a.agent.params),
                    jax.tree.leaves(ts_b.agent.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts_a.agent.value_rms.mean),
                               np.asarray(ts_b.agent.value_rms.mean),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ts_a.agent.value_rms.var),
                               np.asarray(ts_b.agent.value_rms.var),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ts_a.agent.obs_rms.mean),
                               np.asarray(ts_b.agent.obs_rms.mean),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ts_a.agent.obs_rms.var),
                               np.asarray(ts_b.agent.obs_rms.var),
                               rtol=1e-4, atol=1e-4)
    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]),
                                   rtol=1e-5, atol=1e-6)

    # continuation: a second fused-GAE iteration stays finite and the
    # normalizer count threads exactly like the unfused path
    ts_b2, _ = it_b(ts_b)
    for leaf in jax.tree.leaves(ts_b2.agent.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(ts_b2.agent.obs_rms.count) == \
        float(ts_a.agent.obs_rms.count) + 8 * 16


def test_chan_fold_matches_numpy_moments():
    """The shared chan_fold helper (used by make_obs_moments and the
    rollout kernel's in-loop accumulator) reproduces exact per-row
    mean / M2 / n over any tiling of the data: folding 13 tiles of
    width 32 equals one-shot numpy moments over all 416 columns."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, n_tiles, tile = 9, 13, 32
    rng = np.random.RandomState(11)
    x = rng.uniform(-50, 50, (rows, n_tiles * tile)).astype(np.float32)

    def kernel(x_ref, out_o):
        i = pl.program_id(0)
        FG.chan_fold(out_o, x_ref[...], float(tile), i == 0)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((rows, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows, 8), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, 8), F32),
        interpret=True,
    )(jnp.asarray(x))

    want_mean = x.mean(axis=1)
    want_m2 = ((x - want_mean[:, None]) ** 2).sum(axis=1)
    np.testing.assert_allclose(np.asarray(out[:, 0]), want_mean,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 1]), want_m2,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[:, 2]),
                               np.full(rows, n_tiles * tile, np.float32))
    assert not np.any(np.asarray(out[:, 3:]))
