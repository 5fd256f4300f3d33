"""The reference's FULL default training run, on the round-4 default
path: scripts/ppo.py defaults are 8192 envs x 32-step rollouts x
100 000 iterations (/root/reference/scripts/ppo.py:41-47) = 26.2 B
env-steps.  Canonical no-frozen tag task, chunked dispatch, finite
params + plateau asserts.  Usage: python bench_ref_scale.py"""
import jax
from madrona_basketball_tpu.utils.benching import run_chunked_train
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
run_chunked_train(ts, make_train_chunk(ti, CH), ITERS, "ref-scale",
                  W, hp.num_rollout_steps, ch=CH, print_every=5000)
