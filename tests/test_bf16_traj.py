"""bf16 trajectory storage: exactness pins for every consumer.

The `--bf16-traj` flagship variant stores the rollout trajectory in
bfloat16 (all kernel math stays f32; values round-to-nearest-even on
store) to halve the iteration's dominant HBM term (the update phase's
update_epochs re-reads — BENCHMARKS.md round 5).  The verification
contract mirrors the f32 pins: each bf16-consuming kernel must equal
its f32 twin evaluated on the SAME bf16-quantized values upcast to f32
— i.e. the ONLY difference bf16 storage introduces is the storage
rounding itself.  Composed with the existing f32 pins (rollout == XLA
on injected noise, update == jax.grad+optax to 2e-6), this is the
"bf16-aware reference chain" the convergence A/B (run_round5_tpu.py)
builds on.  Recipe preserved: /root/reference/scripts/ppo.py:180-216.
"""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu import engine
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.engine_fused import noise_to_rows
from madrona_basketball_tpu.models import agent as agent_lib
from madrona_basketball_tpu.ops import fused_gae as FG
from madrona_basketball_tpu.ops import fused_rollout as FR
from madrona_basketball_tpu.ops import fused_update as FU
from madrona_basketball_tpu.ops import layout
from madrona_basketball_tpu.ops.fused_step import fused_step_xla
from madrona_basketball_tpu.ppo.hparams import PPOParams

F32 = jnp.float32
BF16 = jnp.bfloat16
N_LOGITS = sum(C.ACTION_BUCKETS)


def _f(x):
    return np.asarray(x.astype(F32))


def _rand_noise(rng, worlds):
    shot = rng.uniform(-1.0, 1.0, size=(worlds, C.NUM_AGENTS, 3))
    reset = np.concatenate([
        rng.uniform(-1.0, 1.0, size=(worlds, 2)),
        rng.uniform(0.0, 1.0, size=(worlds, 1))], axis=1)
    return (jnp.asarray(shot.astype(np.float32)),
            jnp.asarray(reset.astype(np.float32)))


def test_rollout_kernel_bf16_store_is_pure_rounding():
    """traj_dtype=bf16 == the f32 kernel's trajectory RTNE-rounded;
    sim state, obs, and the in-kernel obs moments are bit-identical
    (the moments fold the PRE-quantization f32 obs)."""
    cfg = SimConfig()
    worlds, T, ti = 128, 2, 1
    _, agent = agent_lib.init_agent(jax.random.PRNGKey(11))
    s = engine.init_batch(cfg, jax.random.PRNGKey(5), worlds)
    sf, si = layout.pack(s)
    rng = np.random.RandomState(21)
    pre = noise_to_rows(*_rand_noise(rng, worlds))
    sf, si, obs0 = fused_step_xla(cfg, sf, si, pre)

    sim_chunks = [noise_to_rows(*_rand_noise(rng, worlds))
                  for _ in range(T)]
    t_u = jnp.asarray(rng.uniform(0, 1, (T, N_LOGITS, worlds)), F32)
    f_u = jnp.asarray(rng.uniform(0, 1, (T, N_LOGITS, worlds)), F32)
    noise = FR.pack_rollout_noise(sim_chunks, t_u, f_u)
    mats = FR.pack_policy(agent)

    outs = {}
    for dt in (F32, BF16):
        rk = FR.make_fused_rollout(cfg, worlds, T, trainee_idx=ti,
                                   use_frozen=False, block=128,
                                   interpret=True, external_noise=True,
                                   obs_moments=True, traj_dtype=dt)
        outs[dt] = rk(noise, sf, si, obs0, *mats)

    (sf32, si32, obs32, traj32, mom32) = outs[F32]
    (sf16, si16, obs16, traj16, mom16) = outs[BF16]
    assert traj16.dtype == BF16
    np.testing.assert_array_equal(np.asarray(sf16), np.asarray(sf32))
    np.testing.assert_array_equal(np.asarray(si16), np.asarray(si32))
    np.testing.assert_array_equal(np.asarray(obs16), np.asarray(obs32))
    np.testing.assert_array_equal(np.asarray(mom16), np.asarray(mom32))
    np.testing.assert_array_equal(_f(traj16), _f(traj32.astype(BF16)))
    # actions and done are exactly representable in bf16
    np.testing.assert_array_equal(_f(traj16[:, FR.R_ACT:FR.R_ACT + 6]),
                                  np.asarray(traj32[:, FR.R_ACT:
                                                    FR.R_ACT + 6]))
    np.testing.assert_array_equal(_f(traj16[:, FR.R_DONE]),
                                  np.asarray(traj32[:, FR.R_DONE]))


def test_fused_gae_bf16_window_matches_f32_on_upcast():
    """The 16-row bf16 GAE window == the f32 kernel fed the upcast of
    the same quantized trajectory (identical f32 math after load)."""
    T, W = 8, 256
    ROWS, RV, RR, RD = 32, 17, 19, 21   # one 16-row window (rows 16-31)
    rng = np.random.RandomState(7)
    traj = rng.normal(scale=4.0, size=(T, ROWS, W)).astype(np.float32)
    traj[:, RD, :] = (rng.uniform(size=(T, W)) < 0.1).astype(np.float32)
    traj16 = jnp.asarray(traj).astype(BF16)
    carry = jnp.asarray(rng.uniform(0, 50, (2, W)), F32)
    nv = jnp.asarray(rng.uniform(-5, 5, (1, W)), F32)
    vstats = jnp.concatenate(
        [jnp.asarray([[-80.0, 30.0]]), jnp.zeros((1, FG.VSTAT_COLS - 2))],
        axis=1).astype(F32)

    g16 = FG.make_fused_gae(T, W, 0.998, 0.95, RV, RR, RD,
                            interpret=True, traj_dtype=BF16)
    g32 = FG.make_fused_gae(T, W, 0.998, 0.95, RV, RR, RD,
                            interpret=True, traj_dtype=F32)
    out16 = g16(traj16, carry, nv, vstats)
    out32 = g32(traj16.astype(F32), carry, nv, vstats)
    for a, b in zip(out16, out32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_obs_moments_bf16_matches_f32_on_upcast():
    T, ROWS, W, used = 4, 32, 128, 19
    rng = np.random.RandomState(3)
    traj16 = jnp.asarray(
        rng.uniform(-20, 20, (T, ROWS, W)).astype(np.float32)
    ).astype(BF16)
    got = FG.make_obs_moments(T, W, used, interpret=True,
                              traj_dtype=BF16)(traj16)
    want = FG.make_obs_moments(T, W, used,
                               interpret=True)(traj16.astype(F32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-5)


def test_update_phase_bf16_matches_f32_on_upcast():
    """The one-launch update phase with traj_dtype=bf16 == the f32
    phase fed the upcast quantized trajectory: identical params, Adam
    moments, for two consecutive phases (nonzero count)."""
    from madrona_basketball_tpu.models.normalize import rms_update
    from madrona_basketball_tpu.ppo.train import make_optimizer

    D = C.OBS_USED
    T, W, wb = 4, 64, 16
    hp = PPOParams(num_envs=W, num_rollout_steps=T, num_minibatches=2,
                   update_epochs=2)
    net, ap = init_agent_with_stats(13)
    tx = make_optimizer(hp)
    clip_s, (adam, scale_s) = tx.init(ap.params)
    nrm = FU.pack_norm(ap.obs_rms, D)
    rng = np.random.RandomState(17)
    traj = rng.normal(scale=3.0,
                      size=(T, FR.ROLL_ROWS, W)).astype(np.float32)
    for j, n in enumerate(C.ACTION_BUCKETS):
        traj[:, FR.R_ACT + j, :] = rng.randint(
            0, n, (T, W)).astype(np.float32)
    traj[:, FR.R_LOGP, :] = rng.normal(
        scale=0.3, size=(T, W)).astype(np.float32)
    traj16 = jnp.asarray(traj).astype(BF16)
    side = jnp.asarray(rng.normal(size=(T, FU.SIDE_ROWS, W)), F32)

    n_blocks = T * (W // wb)
    perms = jnp.argsort(
        jax.random.bits(jax.random.PRNGKey(50),
                        (hp.update_epochs, n_blocks), jnp.uint32),
        axis=1).astype(jnp.int32).reshape(-1)

    ufp16 = FU.make_fused_update_phase(hp, D, T, W, wb, interpret=True,
                                       traj_dtype=BF16)
    ufp32 = FU.make_fused_update_phase(hp, D, T, W, wb, interpret=True)
    mats = (FU.pack_weights(ap.params, D) + FU.pack_weights(adam.mu, D)
            + FU.pack_weights(adam.nu, D))
    out16 = ufp16(perms, adam.count, traj16, side, nrm, *mats)
    out32 = ufp32(perms, adam.count, traj16.astype(F32), side, nrm,
                  *mats)
    for a, b in zip(out16, out32):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-7)


def init_agent_with_stats(seed):
    from madrona_basketball_tpu.models.normalize import rms_update
    net, ap = agent_lib.init_agent(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    ap = ap.replace(obs_rms=rms_update(
        ap.obs_rms,
        jnp.asarray(rng.normal(0.5, 1.5, (128, C.OBS_SIZE)), F32)))
    return net, ap


def test_trainer_bf16_traj_close_to_f32():
    """Full flagship iteration with bf16_traj: identical rollout and
    obs normalizer (actions come from the f32 VMEM obs, moments fold
    pre-quantization), params within the storage-rounding envelope of
    the f32 run (Adam bounds one step by ~lr), finite over two
    iterations."""
    from madrona_basketball_tpu.ppo import train_fused as TF

    cfg = SimConfig()
    hp = PPOParams(num_envs=16, num_rollout_steps=8, num_minibatches=2,
                   update_epochs=2, use_frozen=False, trainee_idx=1)
    net, _ = agent_lib.init_agent(jax.random.PRNGKey(0))

    results = {}
    for bf in (False, True):
        ts = TF.init_fused_train_state(cfg, hp, net,
                                       jax.random.PRNGKey(7))
        it = TF.make_train_iteration_fused(
            cfg, hp, net, backend="xla", rollout_kernel=True,
            rollout_interpret=True, fused_gae=True, bf16_traj=bf)
        ts, m = it(ts)
        results[bf] = (ts, m, it)

    (ts_a, m_a, _), (ts_b, m_b, it_b) = results[False], results[True]
    # obs normalizer folds the pre-quantization f32 obs -> identical
    np.testing.assert_array_equal(np.asarray(ts_a.agent.obs_rms.mean),
                                  np.asarray(ts_b.agent.obs_rms.mean))
    np.testing.assert_array_equal(np.asarray(ts_a.agent.obs_rms.var),
                                  np.asarray(ts_b.agent.obs_rms.var))
    assert float(ts_a.agent.obs_rms.count) == \
        float(ts_b.agent.obs_rms.count)
    # value_rms sees bf16-rounded values: close, not equal
    np.testing.assert_allclose(np.asarray(ts_a.agent.value_rms.mean),
                               np.asarray(ts_b.agent.value_rms.mean),
                               rtol=2e-2, atol=2e-2)
    for a, b in zip(jax.tree.leaves(ts_a.agent.params),
                    jax.tree.leaves(ts_b.agent.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3)
    ts_b2, _ = it_b(ts_b)
    for leaf in jax.tree.leaves(ts_b2.agent.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
