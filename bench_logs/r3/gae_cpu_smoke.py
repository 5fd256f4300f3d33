"""CPU learning smoke of the flag-gated fused-GAE trainer: the full
flagship iteration (rollout kernel in interpret mode + one-launch
update + fused-GAE pass) trained for several hundred iterations on the
canonical no-frozen task.  Complements tests/test_fused_gae.py's
one-iteration exactness pin with does-it-actually-learn evidence while
the TPU tunnel is down; the hardware curve runs in
run_round3_tpu.py gaeconv.

Usage: JAX_PLATFORMS=cpu python bench_logs/r3/gae_cpu_smoke.py [W] [iters]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import numpy as np


def main():
    jax.config.update("jax_platforms", "cpu")
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state, make_train_iteration_fused)

    fused_gae = "--no-fused-gae" not in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    W = int(argv[0]) if len(argv) > 0 else 128
    iters = int(argv[1]) if len(argv) > 1 else 400

    cfg = SimConfig()
    hp = PPOParams(num_envs=W, use_frozen=False)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(2))
    ti = jax.jit(make_train_iteration_fused(
        cfg, hp, net, backend="xla", rollout_kernel=True,
        rollout_interpret=True, fused_gae=fused_gae))
    print(f"fused_gae={fused_gae} W={W} iters={iters}", flush=True)

    t0 = time.perf_counter()
    for i in range(1, iters + 1):
        ts, m = ti(ts)
        if i % 20 == 0 or i == 1:
            r = float(np.asarray(m["mean_reward"]))
            ln = float(np.asarray(m["mean_episode_length"]))
            print(f"iter {i}: reward {r:.1f} len {ln:.1f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    finite = all(np.isfinite(np.asarray(x)).all()
                 for x in jax.tree.leaves(ts.agent.params))
    print(f"DONE {iters} iters params_finite={finite}", flush=True)


if __name__ == "__main__":
    main()
