import glob, jax, numpy as np
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo import train_fused as TF
from madrona_basketball_tpu.utils.profiling import trace

cfg = SimConfig()
hp = PPOParams(num_envs=8192, num_rollout_steps=32)
net, _ = init_agent(jax.random.PRNGKey(0))
ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
it = TF.make_train_iteration_fused(cfg, hp, net, backend="pallas")
ts, m = it(ts)
np.asarray(jax.tree_util.tree_leaves(ts.agent.params)[0].ravel()[:1])
with trace("/tmp/mbtpu_prof"):
    for _ in range(3):
        ts, m = it(ts)
    np.asarray(jax.tree_util.tree_leaves(ts.agent.params)[0].ravel()[:1])
print("files:", glob.glob("/tmp/mbtpu_prof/**/*", recursive=True)[:10])
