import time, jax, numpy as np
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo import train_fused as TF

cfg = SimConfig()
hp = PPOParams(num_envs=8192, num_rollout_steps=32)
net, _ = init_agent(jax.random.PRNGKey(0))
ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
it = TF.make_train_iteration_fused(cfg, hp, net, backend="pallas")
t0 = time.perf_counter()
for i in range(1, 301):
    ts, m = it(ts)
    if i % 100 == 0:
        print(f"iter {i}: mean_reward={float(m['mean_reward']):.1f} "
              f"mean_len={float(m['mean_episode_length']):.1f}")
print(f"300 iters wall: {time.perf_counter()-t0:.1f}s")
