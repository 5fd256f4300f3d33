"""Real-TPU check of the SHARDED rollout-kernel trainer's production
branch (VERDICT r2 weak #2a).

The flagship trainer's non-interpret sharded path — per-shard on-chip
PRNG seeds threaded through `shard_map` with `P("data", None)`
(ppo/train_fused.py make_rng_arg) — cannot run under the CPU dryrun
(interpret mode takes the external-noise branch), so this script runs it
on the real chip with a 1-device mesh and asserts it computes the SAME
training trajectory as `mesh=None`: with one shard, make_rng_arg draws
the identical seed from the identical key, so parameters must agree to
f32 partitioner-fusion tolerance after several iterations.

Usage (default env, TPU via axon): python check_sharded_tpu.py [W] [iters]
"""

import sys

import jax
import numpy as np

from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.parallel.mesh import (make_mesh,
                                                  shard_fused_train_state)
from madrona_basketball_tpu.ppo import train_fused as TF
from madrona_basketball_tpu.ppo.hparams import PPOParams


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    assert jax.devices()[0].platform == "tpu", "needs the real TPU"
    cfg = SimConfig()
    hp = PPOParams(num_envs=W, use_frozen=True)
    net, _ = init_agent(jax.random.PRNGKey(0))

    def train(mesh):
        ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
        if mesh is not None:
            ts = shard_fused_train_state(ts, mesh)
        it = TF.make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                           mesh=mesh, rollout_kernel=True)
        for _ in range(iters):
            ts, m = it(ts)
        jax.block_until_ready(ts.agent.params)
        return ts, m

    print(f"[sharded-tpu] W={W} iters={iters}: mesh=None ...", flush=True)
    ts_u, m_u = train(None)
    print("[sharded-tpu] 1-device mesh (shard_map, per-shard PRNG seeds, "
          "P('data') specs) ...", flush=True)
    mesh = make_mesh(jax.devices()[:1])
    ts_s, m_s = train(mesh)

    assert set(m_u) == set(m_s)
    for k in m_u:
        assert np.asarray(m_u[k]).shape == np.asarray(m_s[k]).shape, k
    worst = 0.0
    for a, b in zip(jax.tree.leaves(ts_u.agent.params),
                    jax.tree.leaves(ts_s.agent.params)):
        worst = max(worst, float(np.max(np.abs(
            np.asarray(jax.device_get(a)) - np.asarray(jax.device_get(b))))))
    print(f"[sharded-tpu] metric shapes match; param max|delta| after "
          f"{iters} iters = {worst:.3e}")
    ok = worst <= 2e-5
    print(f"[sharded-tpu] {'PASS' if ok else 'FAIL (tolerance 2e-5)'}; "
          f"mean_reward sharded={float(m_s['mean_reward']):.3f} "
          f"unsharded={float(m_u['mean_reward']):.3f}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
