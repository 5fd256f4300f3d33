import time
import jax
from madrona_basketball_tpu.utils.benching import fetch_sync
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
for W in (8192, 65536):
    hp = PPOParams(num_envs=W, use_frozen=True)
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
    ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                    rollout_kernel=True, fused_gae=True)
    chunk = make_train_chunk(ti, 100)
    t0 = time.perf_counter()
    ts, _ = chunk(ts)
    fetch_sync(ts.sf)
    print(f"[gae-chunk-{W}] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    for rnd in range(3):
        t0 = time.perf_counter()
        ts, _ = chunk(ts)
        fetch_sync(ts.sf)
        ms = (time.perf_counter()-t0) / 100 * 1e3
        sps = W * hp.num_rollout_steps / ms * 1e3 / 1e6
        print(f"[gae-chunk-{W}] round {rnd}: iter={ms:.2f} ms  "
              f"train_steps/s={sps:.1f}M", flush=True)
