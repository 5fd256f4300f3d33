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
ts, m = it(ts)
jax.block_until_ready(ts.agent.params)
print(f"compile+first: {time.perf_counter()-t0:.1f}s")

def leaf0(p):
    return np.asarray(jax.tree_util.tree_leaves(p)[0])[:1]

leaf0(ts.agent.params)  # warm fetch path
# honest: chained iterations, fetch-synced, best of 3
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        ts, m = it(ts)
    leaf0(ts.agent.params)
    best = min(best, (time.perf_counter() - t0) / 10)
print(f"fused train iter: {best*1e3:.2f} ms -> "
      f"{hp.num_envs*hp.num_rollout_steps/best/1e6:,.1f}M env-steps/s train")
print("mean_reward:", float(m["mean_reward"]))
