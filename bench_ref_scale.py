"""The reference's FULL default training run, on the round-4 default
path: scripts/ppo.py defaults are 8192 envs x 32-step rollouts x
100 000 iterations (/root/reference/scripts/ppo.py:41-47) = 26.2 B
env-steps.  Canonical no-frozen tag task, chunked dispatch, finite
params + plateau asserts.  Usage: python bench_ref_scale.py"""
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

W, ITERS, CH = 8192, 100_000, 100
cfg = SimConfig()
net, _ = init_agent(jax.random.PRNGKey(0))
hp = PPOParams(num_envs=W, use_frozen=False)
ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(3))
ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                rollout_kernel=True, fused_gae=True)
chunk = make_train_chunk(ti, CH)
t0 = time.perf_counter()
done = 0
while done < ITERS:
    ts, st = chunk(ts)
    done += CH
    if done % 5000 == 0:
        r = float(np.asarray(jax.device_get(st["mean_reward"][-1])))
        ln = float(np.asarray(jax.device_get(
            st["mean_episode_length"][-1])))
        print(f"[ref-scale] iter {done}: reward {r:.1f} len {ln:.1f} "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
finite = all(np.isfinite(np.asarray(jax.device_get(x))).all()
             for x in jax.tree.leaves(ts.agent.params))
el = time.perf_counter() - t0
print(f"[ref-scale] DONE {done} iters ({done*W*32/1e9:.1f}B env-steps) "
      f"in {el:.0f}s wall params_finite={finite} "
      f"sustained {done*W*32/el/1e6:.1f}M steps/s incl. compile",
      flush=True)
