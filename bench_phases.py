"""Per-phase timing of one PPO iteration: rollout / GAE+normalizers /
minibatch update, each as its own jitted dispatch (chained-launch,
fetch-synced, best of 3).  The phase sum slightly exceeds the fused
whole-iteration time (extra dispatch boundaries) but shows where the
milliseconds live.

Note: this tool times the GENERIC phases in isolation (full-width obs,
autodiff update) for diagnosis; the production iteration fuses them
differently (packed obs, fused gradient kernel) and is substantially
faster end-to-end — see bench_train.py and BENCHMARKS.md.

Usage: python bench_phases.py [num_envs]
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


from madrona_basketball_tpu.utils.benching import bench_ms


def bench(fn, args, fetch, reps=20, tries=3):
    return bench_ms(fn, args, reps=reps, tries=tries, fetch=fetch)


def main():
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ops import fused_rollout as FR
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train import make_update_fns
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state)

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    cfg = SimConfig()
    hp = PPOParams(num_envs=W)
    T = hp.num_rollout_steps
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))

    def fetch(tree):
        leaf = jax.tree_util.tree_leaves(tree)[0]
        np.asarray(jax.device_get(leaf.reshape(-1)[:1]))

    # ---- rollout kernel (policy in the loop) ----
    rk = FR.make_fused_rollout(cfg, W, T, trainee_idx=hp.trainee_idx,
                               use_frozen=False, block=1024)

    @jax.jit
    def rollout(seed, sf, si, obs, agent):
        return rk(seed, sf, si, obs, *FR.pack_policy(agent))

    seed = jnp.zeros((1, 2), jnp.int32)
    sf, si, obs, traj = jax.jit(rollout)(seed, ts.sf, ts.si, ts.obs,
                                         ts.agent)
    t_roll = bench(rollout, (seed, sf, si, obs, ts.agent), fetch)

    # ---- unpack traj -> buf ----
    @jax.jit
    def unpack(traj, agent, obs):
        from madrona_basketball_tpu.models import agent as agent_lib
        ti_lo = hp.trainee_idx * 128
        buf = dict(
            # zero-pad the packed obs back to the network width: this
            # tool feeds the generic full-width compute_advantages,
            # whose rms_update expects 128-dim rows
            obs=jnp.pad(jnp.swapaxes(traj[:, 0:FR.ROLL_OBS, :], 1, 2),
                        ((0, 0), (0, 0), (0, 128 - FR.ROLL_OBS))),
            actions=jnp.swapaxes(
                traj[:, FR.R_ACT:FR.R_ACT + 6, :], 1, 2).astype(jnp.int32),
            log_probs=traj[:, FR.R_LOGP, :],
            values=traj[:, FR.R_VALUE, :],
            rewards=traj[:, FR.R_REW, :],
            not_dones=1.0 - traj[:, FR.R_DONE, :],
            next_value=agent_lib.evaluate(net, agent,
                                          obs[ti_lo:ti_lo + 128].T))
        return buf

    buf = unpack(traj, ts.agent, obs)
    t_unpack = bench(unpack, (traj, ts.agent, obs), fetch)

    # ---- advantages ----
    ca, up = make_update_fns(hp, net)
    ca = jax.jit(ca)
    agent2, adv, vn, rn = ca(ts.agent, buf)
    t_adv = bench(ca, (ts.agent, buf), fetch)

    # ---- update ----
    up = jax.jit(up)
    key = jax.random.PRNGKey(9)
    out = up(agent2, ts.opt_state, buf, adv, vn, rn, key)
    t_up = bench(up, (agent2, ts.opt_state, buf, adv, vn, rn, key), fetch)

    print(f"W={W} T={T}  rollout={t_roll:.2f} ms  unpack={t_unpack:.2f} ms  "
          f"advantages={t_adv:.2f} ms  update={t_up:.2f} ms  "
          f"sum={t_roll + t_unpack + t_adv + t_up:.2f} ms")


if __name__ == "__main__":
    main()
