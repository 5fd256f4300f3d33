"""Round-4 soaks of the NEW default path (rollout kernel + one-launch
update + fused-GAE): 10 000 iterations @ 8192 on the canonical
no-frozen task and 2 000 iterations @ 65536 frozen-opponent, chunked
dispatch, finite-params assert — the round-2/3 soak recipe re-run on
the round-4 default.  Usage: python bench_gae_soak.py"""
import time
import jax
import numpy as np
from madrona_basketball_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo.train import make_train_chunk
from madrona_basketball_tpu.ppo.train_fused import (
    init_fused_train_state, make_train_iteration_fused)

cfg = SimConfig()
net, _ = init_agent(jax.random.PRNGKey(0))
for W, iters, frozen in ((8192, 10000, False), (65536, 2000, True)):
    hp = PPOParams(num_envs=W, use_frozen=frozen)
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(2))
    ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                    rollout_kernel=True, fused_gae=True)
    chunk = make_train_chunk(ti, 100)
    t0 = time.perf_counter()
    done = 0
    while done < iters:
        ts, st = chunk(ts)
        done += 100
        if done % 1000 == 0 or done == iters:
            r = float(np.asarray(jax.device_get(st["mean_reward"][-1])))
            ln = float(np.asarray(jax.device_get(
                st["mean_episode_length"][-1])))
            print(f"[gae-soak-{W}] iter {done}: reward {r:.1f} "
                  f"len {ln:.1f} ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
    finite = all(np.isfinite(np.asarray(jax.device_get(x))).all()
                 for x in jax.tree.leaves(ts.agent.params))
    fps = done * W * hp.num_rollout_steps / (time.perf_counter() - t0)
    print(f"[gae-soak-{W}] DONE {done} iters params_finite={finite} "
          f"sustained {fps/1e6:.1f}M steps/s incl. compile", flush=True)
