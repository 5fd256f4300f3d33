"""Round-3 iteration decomposition: rollout kernel vs GAE/stats segment
vs the ONE-LAUNCH update phase, each timed as its own jitted dispatch
(chained launches, scalar-fetch sync, best of 3), plus the fused whole
iteration for the cross-check (parts overlap it because each extra
dispatch pays its own launch latency).

Run on the real TPU from the repo root:  python bench_r3_decomp.py [W]
"""

import sys

import jax
import jax.numpy as jnp


from madrona_basketball_tpu.utils.benching import bench_ms as bench


def main():
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu import constants as C
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models import agent as agent_lib
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.models.normalize import (rms_normalize,
                                                         rms_update)
    from madrona_basketball_tpu.ops import fused_rollout as FR
    from madrona_basketball_tpu.ops import fused_update as FU
    from madrona_basketball_tpu.ops.gae import compute_gae
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train import make_optimizer
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state, make_train_iteration_fused)

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    T = 32
    cfg = SimConfig()
    hp = PPOParams(num_envs=W, use_frozen=True)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))

    # ---- full iteration (the production number) ----
    ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                    rollout_kernel=True)
    t_full = bench(lambda s: ti(s)[0], (ts,))
    print(f"full_iteration: {t_full:.2f} ms", flush=True)

    # ---- rollout kernel alone ----
    rk = FR.make_fused_rollout(cfg, W, T, trainee_idx=1, use_frozen=True,
                               block=1024)
    mats = FR.pack_policy(ts.agent) + FR.pack_policy(ts.frozen)
    rng = jnp.zeros((1, 2), jnp.int32).at[0, 0].set(7)

    @jax.jit
    def rollout_only(sf, si, obs):
        return rk(rng, sf, si, obs, *mats)

    t_roll = bench(rollout_only, (ts.sf, ts.si, ts.obs))
    sf2, si2, obs2, traj = rollout_only(ts.sf, ts.si, ts.obs)
    print(f"rollout_kernel: {t_roll:.2f} ms", flush=True)

    # ---- GAE + normalizer + side-array + perms segment ----
    agent = ts.agent
    OBS = C.OBS_SIZE

    @jax.jit
    def gae_segment(agent, traj, obs, key):
        values = traj[:, FR.R_VALUE, :]
        rewards = traj[:, FR.R_REW, :]
        done = traj[:, FR.R_DONE, :]
        not_dones = 1.0 - done
        next_value = agent_lib.evaluate(net, agent, obs[:OBS].T)
        values_un = agent_lib.unnorm_value(agent, values)
        next_un = agent_lib.unnorm_value(agent, next_value)
        adv, ret = compute_gae(rewards, values_un, not_dones, next_un,
                               hp.gamma, hp.gae_lambda)
        value_rms = rms_update(agent.value_rms, values_un.reshape(-1, 1))
        value_rms = rms_update(value_rms, ret.reshape(-1, 1))
        adv_n = (adv - adv.mean()) / (adv.std(ddof=1) + 1e-8)
        values_n = rms_normalize(value_rms, values_un.reshape(-1, 1),
                                 clamp=5.0).reshape(values.shape)
        ret_n = rms_normalize(value_rms, ret.reshape(-1, 1),
                              clamp=5.0).reshape(ret.shape)
        side = jnp.concatenate([
            jnp.stack([values_n, adv_n, ret_n], axis=1),
            jnp.zeros((T, FU.SIDE_ROWS - 3, W), jnp.float32)], axis=1)
        n_blocks = T * (W // FU.pick_update_block(W, hp.minibatch_size))
        perms = jnp.argsort(
            jax.random.bits(key, (hp.update_epochs, n_blocks),
                            jnp.uint32), axis=1).astype(jnp.int32)
        return side, perms.reshape(-1)

    key = jax.random.PRNGKey(3)
    t_gae = bench(gae_segment, (agent, traj, obs2, key))
    side, perms = gae_segment(agent, traj, obs2, key)
    print(f"gae_segment:    {t_gae:.2f} ms", flush=True)

    # ---- one-launch update phase alone ----
    wb = FU.pick_update_block(W, hp.minibatch_size)
    ufp = FU.make_fused_update_phase(hp, FR.ROLL_OBS, T, W, wb)
    tx = make_optimizer(hp)
    opt_state = tx.init(agent.params)
    _, (adam, _) = opt_state
    nrm = FU.pack_norm(agent.obs_rms, FR.ROLL_OBS)
    p_mats = FU.pack_weights(agent.params, FR.ROLL_OBS)
    m_mats = FU.pack_weights(adam.mu, FR.ROLL_OBS)
    v_mats = FU.pack_weights(adam.nu, FR.ROLL_OBS)

    @jax.jit
    def update_only(perms, count, traj, side, nrm, *mats):
        return ufp(perms, count, traj, side, nrm, *mats)

    t_upd = bench(update_only,
                  (perms, adam.count, traj, side, nrm,
                   *p_mats, *m_mats, *v_mats))
    print(f"update_phase:   {t_upd:.2f} ms", flush=True)
    print(f"parts_sum:      {t_roll + t_gae + t_upd:.2f} ms "
          f"(vs full {t_full:.2f})", flush=True)

    # ---- fused-GAE variant of the full iteration (ops/fused_gae.py:
    # GAE + side assembly in one Pallas pass, normalization inside the
    # update kernel) ----
    try:
        ti_fg = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                           rollout_kernel=True,
                                           fused_gae=True)
        ts_fg = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
        t_fg = bench(lambda s: ti_fg(s)[0], (ts_fg,))
        print(f"full_iteration_fused_gae: {t_fg:.2f} ms "
              f"({W * T / t_fg / 1e3:.1f}M train steps/s)", flush=True)
    except Exception as e:  # noqa: BLE001 — first hardware run of these kernels
        print(f"full_iteration_fused_gae: FAILED {e!r}", flush=True)


if __name__ == "__main__":
    main()
