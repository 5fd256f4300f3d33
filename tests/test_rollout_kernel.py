"""Policy-in-the-loop rollout kernel vs a plain-XLA reference rollout.

The kernel (ops/fused_rollout.py) must reproduce, on identical noise
draws, exactly what the two-phase trainer does per tick: flax policy
forward on the pre-tick obs, Gumbel-max bucket sampling, action write,
full sim tick.  The reference here is built from the same public pieces
the production scan path uses (models.agent normalize/apply +
models.action bucket math + ops.fused_step.fused_step_xla)."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu import engine
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.engine_fused import noise_to_rows
from madrona_basketball_tpu.models import agent as agent_lib
from madrona_basketball_tpu.models.normalize import rms_normalize
from madrona_basketball_tpu.ops import layout
from madrona_basketball_tpu.ops.fused_rollout import (
    R_ACT, R_DONE, R_LOGP, R_REW, R_VALUE, ROLL_OBS, gumbel_from_uniform,
    make_fused_rollout, pack_policy, pack_rollout_noise)
from madrona_basketball_tpu.ops.fused_step import fused_step_xla

F32 = jnp.float32
I32 = jnp.int32
OBS = C.OBS_SIZE
N_LOGITS = sum(C.ACTION_BUCKETS)


def _rand_noise(rng, worlds):
    shot = rng.uniform(-1.0, 1.0, size=(worlds, C.NUM_AGENTS, 3))
    reset = np.concatenate([
        rng.uniform(-1.0, 1.0, size=(worlds, 2)),
        rng.uniform(0.0, 1.0, size=(worlds, 1))], axis=1)
    return shot.astype(np.float32), reset.astype(np.float32)


def _sample_with_gumbel(logits, gumbel):
    """models.action.sample with an injected Gumbel tensor; (B, 19)."""
    noisy = logits + gumbel
    acts, lps = [], []
    off = 0
    for n in C.ACTION_BUCKETS:
        a = jnp.argmax(noisy[:, off:off + n], axis=-1)
        lp = jax.nn.log_softmax(logits[:, off:off + n], axis=-1)
        onehot = jnp.arange(n, dtype=I32) == a[:, None].astype(I32)
        lps.append(jnp.sum(jnp.where(onehot, lp, 0.0), axis=-1))
        acts.append(a)
        off += n
    return (jnp.stack(acts, axis=1).astype(I32),
            jnp.stack(lps, axis=1).sum(axis=-1))


def _policy_step(net, ap, obs_rows, lo, gum_u):
    obs = obs_rows[lo:lo + OBS].T                      # (W, OBS)
    x = rms_normalize(ap.obs_rms, obs, clamp=5.0)
    logits, value = net.apply(ap.params, x)
    actions, logp = _sample_with_gumbel(
        logits, gumbel_from_uniform(gum_u).T)
    return actions, logp, value


def _run_kernel_vs_xla(use_frozen):
    cfg = SimConfig()
    worlds, T, ti = 256, 3, 1
    net, agent = agent_lib.init_agent(jax.random.PRNGKey(11))
    _, frozen = agent_lib.init_agent(jax.random.PRNGKey(12))

    s = engine.init_batch(cfg, jax.random.PRNGKey(5), worlds)
    sf, si = layout.pack(s)
    rng = np.random.RandomState(21)
    shot, reset = _rand_noise(rng, worlds)
    pre = noise_to_rows(jnp.asarray(shot), jnp.asarray(reset))
    sf, si, obs0 = fused_step_xla(cfg, sf, si, pre)

    sim_chunks = []
    for _ in range(T):
        shot, reset = _rand_noise(rng, worlds)
        sim_chunks.append(noise_to_rows(jnp.asarray(shot),
                                        jnp.asarray(reset)))
    t_u = jnp.asarray(rng.uniform(0.0, 1.0, (T, N_LOGITS, worlds)), F32)
    f_u = jnp.asarray(rng.uniform(0.0, 1.0, (T, N_LOGITS, worlds)), F32)

    rollout = make_fused_rollout(cfg, worlds, T, trainee_idx=ti,
                                 use_frozen=use_frozen, block=128,
                                 interpret=True, external_noise=True)
    noise = pack_rollout_noise(sim_chunks, t_u, f_u)
    mats = pack_policy(agent) + (pack_policy(frozen) if use_frozen
                                 else ())
    sf_k, si_k, obs_k, traj = rollout(noise, sf, si, obs0, *mats)

    # ---- reference rollout ----
    ti_lo, fi_lo = ti * OBS, (1 - ti) * OBS
    t_rows = [layout.I_IDX[f"a{ti}.{n}"] for n in
              ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
               "a_shoot")]
    f_rows = [layout.I_IDX[f"a{1 - ti}.{n}"] for n in
              ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
               "a_shoot")]
    sf_r, si_r, obs_r = sf, si, obs0
    for t in range(T):
        actions, logp, value = _policy_step(net, agent, obs_r, ti_lo,
                                            t_u[t])
        if use_frozen:
            f_actions, _, _ = _policy_step(net, frozen, obs_r, fi_lo,
                                           f_u[t])
        np.testing.assert_array_equal(
            np.asarray(traj[t, R_ACT:R_ACT + 6].T, dtype=np.int32),
            np.asarray(actions))
        np.testing.assert_allclose(np.asarray(traj[t, 0:ROLL_OBS]),
                                   np.asarray(
                                       obs_r[ti_lo:ti_lo + ROLL_OBS]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(traj[t, R_LOGP]),
                                   np.asarray(logp), atol=1e-4)
        np.testing.assert_allclose(np.asarray(traj[t, R_VALUE]),
                                   np.asarray(value), atol=1e-4)
        for j in range(6):
            si_r = si_r.at[t_rows[j]].set(actions[:, j])
            if use_frozen:
                si_r = si_r.at[f_rows[j]].set(f_actions[:, j])
        sf_r, si_r, obs_r = fused_step_xla(cfg, sf_r, si_r, sim_chunks[t])
        np.testing.assert_allclose(np.asarray(traj[t, R_REW]),
                                   np.asarray(
                                       sf_r[layout.F_IDX[f"a{ti}.reward"]]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(traj[t, R_DONE]),
                                   np.asarray(
                                       sf_r[layout.F_IDX[f"a{ti}.done"]]),
                                   atol=0)

    np.testing.assert_allclose(np.asarray(sf_k), np.asarray(sf_r),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(si_k), np.asarray(si_r))
    np.testing.assert_allclose(np.asarray(obs_k), np.asarray(obs_r),
                               atol=1e-5)


def test_rollout_kernel_matches_xla_reference():
    _run_kernel_vs_xla(use_frozen=True)


def test_rollout_kernel_matches_xla_no_frozen():
    """The canonical learning task's shape (defender trainee, opponent
    driven in-sim by hardCodeDefense — no frozen policy forward and no
    opponent action write inside the kernel)."""
    _run_kernel_vs_xla(use_frozen=False)


def test_rollout_kernel_block_invariance():
    """blk=128 vs blk=256 on the same external noise: the world-block
    size only changes grid partitioning (every computation is
    per-world-column), so the rollout_block sweep (bench_rollout_blk.py,
    max_block override) cannot change training semantics.  Integer
    outputs must match exactly; floats to 1-ulp scale — the CPU
    interpreter compiles each block width as its own XLA program, whose
    FMA/vectorization choices differ in the last bit (measured max
    |delta| 1.2e-7 on the obs array)."""
    cfg = SimConfig()
    worlds, T, ti = 256, 2, 1
    _, agent = agent_lib.init_agent(jax.random.PRNGKey(11))
    _, frozen = agent_lib.init_agent(jax.random.PRNGKey(12))

    s = engine.init_batch(cfg, jax.random.PRNGKey(5), worlds)
    sf, si = layout.pack(s)
    rng = np.random.RandomState(33)
    shot, reset = _rand_noise(rng, worlds)
    pre = noise_to_rows(jnp.asarray(shot), jnp.asarray(reset))
    sf, si, obs0 = fused_step_xla(cfg, sf, si, pre)

    sim_chunks = []
    for _ in range(T):
        shot, reset = _rand_noise(rng, worlds)
        sim_chunks.append(noise_to_rows(jnp.asarray(shot),
                                        jnp.asarray(reset)))
    t_u = jnp.asarray(rng.uniform(0.0, 1.0, (T, N_LOGITS, worlds)), F32)
    f_u = jnp.asarray(rng.uniform(0.0, 1.0, (T, N_LOGITS, worlds)), F32)
    noise = pack_rollout_noise(sim_chunks, t_u, f_u)
    mats = pack_policy(agent) + pack_policy(frozen)

    outs = []
    for blk in (128, 256):
        rollout = make_fused_rollout(cfg, worlds, T, trainee_idx=ti,
                                     use_frozen=True, block=blk,
                                     max_block=blk, interpret=True,
                                     external_noise=True)
        outs.append(rollout(noise, sf, si, obs0, *mats))
    for a, b in zip(outs[0], outs[1]):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int32:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, atol=2e-6)


def _run_tiled_vs_1d(use_frozen):
    """The 2-D-tiled prototype (make_fused_rollout_tiled) == the 1-D
    kernel on identical external noise: the tiling is a pure layout
    permutation (world w at (w // cols, w % cols), free reshape at the
    buffer level) plus in-kernel relayouts at the policy boundary, so
    every per-world result must agree — ints exactly, floats to 1-ulp
    scale (separately compiled XLA programs in interpret mode)."""
    from madrona_basketball_tpu.ops.fused_rollout import \
        make_fused_rollout_tiled
    cfg = SimConfig()
    worlds, T, ti = 1024, 2, 1
    _, agent = agent_lib.init_agent(jax.random.PRNGKey(11))
    _, frozen = agent_lib.init_agent(jax.random.PRNGKey(12))

    s = engine.init_batch(cfg, jax.random.PRNGKey(5), worlds)
    sf, si = layout.pack(s)
    rng = np.random.RandomState(44)
    shot, reset = _rand_noise(rng, worlds)
    pre = noise_to_rows(jnp.asarray(shot), jnp.asarray(reset))
    sf, si, obs0 = fused_step_xla(cfg, sf, si, pre)

    sim_chunks = []
    for _ in range(T):
        shot, reset = _rand_noise(rng, worlds)
        sim_chunks.append(noise_to_rows(jnp.asarray(shot),
                                        jnp.asarray(reset)))
    t_u = jnp.asarray(rng.uniform(0.0, 1.0, (T, N_LOGITS, worlds)), F32)
    f_u = jnp.asarray(rng.uniform(0.0, 1.0, (T, N_LOGITS, worlds)), F32)
    noise = pack_rollout_noise(sim_chunks, t_u, f_u)
    mats = pack_policy(agent) + (pack_policy(frozen) if use_frozen
                                 else ())

    r1d = make_fused_rollout(cfg, worlds, T, trainee_idx=ti,
                             use_frozen=use_frozen, block=1024,
                             interpret=True, external_noise=True)
    r2d = make_fused_rollout_tiled(cfg, worlds, T, trainee_idx=ti,
                                   use_frozen=use_frozen, block=1024,
                                   interpret=True, external_noise=True)
    out1 = r1d(noise, sf, si, obs0, *mats)
    out2 = r2d(noise, sf, si, obs0, *mats)
    for a, b in zip(out1, out2):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.int32:
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, atol=2e-6)


def test_rollout_kernel_tiled_matches_1d():
    _run_tiled_vs_1d(use_frozen=True)


def test_rollout_kernel_tiled_matches_1d_no_frozen():
    """The canonical learning task's shape (no frozen policy inside the
    kernel — the opponent runs on in-sim hardCodeDefense)."""
    _run_tiled_vs_1d(use_frozen=False)


def test_policy_forward_rows_matches_flax():
    """Feature-major in-kernel policy math == models.agent.forward's
    normalize + net.apply, to f32 tolerance."""
    from madrona_basketball_tpu.ops.fused_rollout import policy_forward_rows
    net, ap = agent_lib.init_agent(jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    obs = jnp.asarray(rng.uniform(-20, 20, (64, OBS)), F32)
    # give the normalizer non-trivial stats
    from madrona_basketball_tpu.models.normalize import rms_update
    ap = ap.replace(obs_rms=rms_update(ap.obs_rms, obs * 0.5 + 1.0))

    x = rms_normalize(ap.obs_rms, obs, clamp=5.0)
    logits_ref, value_ref = net.apply(ap.params, x)

    logits, value = policy_forward_rows(obs.T, *pack_policy(ap))
    np.testing.assert_allclose(np.asarray(logits.T),
                               np.asarray(logits_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(value), np.asarray(value_ref),
                               atol=2e-5)


def test_trainer_tiled_matches_1d():
    """Full train iteration with rollout_tiled=True == rollout_tiled=
    False (same seed, interpret mode): the external-noise chunk is
    identical for both kernels, the tiled rollout is pinned
    trajectory-equal to the 1-D one above, so the post-update
    parameters must agree to f32 rounding.  Guards the trainer wiring
    (--rollout-tiled), not just the standalone kernel."""
    from madrona_basketball_tpu.ppo import train_fused as TF
    from madrona_basketball_tpu.ppo.hparams import PPOParams

    cfg = SimConfig()
    # tiled needs num_envs % 1024 == 0 (cols % 128 == 0)
    hp = PPOParams(num_envs=1024, num_rollout_steps=2, num_minibatches=2,
                   update_epochs=1, use_frozen=False, trainee_idx=1)
    net, _ = agent_lib.init_agent(jax.random.PRNGKey(0))

    results = []
    for tiled in (False, True):
        ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(7))
        it = TF.make_train_iteration_fused(cfg, hp, net, backend="xla",
                                           rollout_kernel=True,
                                           rollout_interpret=True,
                                           rollout_tiled=tiled)
        ts, m = it(ts)
        results.append((ts, m))
    (ts_a, m_a), (ts_b, m_b) = results
    for a, b in zip(jax.tree.leaves(ts_a.agent.params),
                    jax.tree.leaves(ts_b.agent.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
    for k in m_a:
        np.testing.assert_allclose(float(m_a[k]), float(m_b[k]),
                                   rtol=1e-5, atol=1e-6)
