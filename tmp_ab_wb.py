"""2000-iter same-seed convergence arm: update_block=4096 (vs ab-f32 wb=2048)."""
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
hp = PPOParams(num_envs=8192, use_frozen=False, trainee_idx=1,
               update_block=4096)
ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(2))
ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                rollout_kernel=True, fused_gae=True)
chunk = make_train_chunk(ti, 100)
run_chunked_train(ts, chunk, 2000, "ab-wb4096", 8192,
                  hp.num_rollout_steps, 100)
