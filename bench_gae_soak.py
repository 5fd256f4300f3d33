"""Round-4 soaks of the NEW default path (rollout kernel + one-launch
update + fused-GAE): 10 000 iterations @ 8192 on the canonical
no-frozen task and 2 000 iterations @ 65536 frozen-opponent, chunked
dispatch, finite-params assert — the round-2/3 soak recipe re-run on
the round-4 default.  Usage: python bench_gae_soak.py"""
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

cfg = SimConfig()
net, _ = init_agent(jax.random.PRNGKey(0))
for W, iters, frozen in ((8192, 10000, False), (65536, 2000, True)):
    hp = PPOParams(num_envs=W, use_frozen=frozen)
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(2))
    ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                    rollout_kernel=True, fused_gae=True)
    run_chunked_train(ts, make_train_chunk(ti, 100), iters,
                      f"gae-soak-{W}", W, hp.num_rollout_steps,
                      ch=100, print_every=1000)
