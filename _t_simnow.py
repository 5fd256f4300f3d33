import time, jax, jax.numpy as jnp, numpy as np
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo import train_fused as TF
from madrona_basketball_tpu.engine_fused import make_noise_fn
from madrona_basketball_tpu.ops.fused_step import make_fused_step

cfg = SimConfig()
hp = PPOParams(num_envs=8192, num_rollout_steps=32)
net, _ = init_agent(jax.random.PRNGKey(0))
ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
kern = make_fused_step(cfg, hp.num_envs)
noise_fn = make_noise_fn(cfg)

@jax.jit
def sim_only(keys, sf, si):
    def body(c, _):
        keys, sf, si = c
        keys, noise = noise_fn(keys)
        sf, si, obs = kern(sf, si, noise)
        return (keys, sf, si), None
    return jax.lax.scan(body, (keys, sf, si), None, length=32)[0]

out = sim_only(ts.env_keys, ts.sf, ts.si)
np.asarray(out[1].ravel()[:1])
for trial in range(5):
    t0 = time.perf_counter()
    out = sim_only(*out)
    np.asarray(out[1].ravel()[:1])
    print(f"trial {trial}: {1e3*(time.perf_counter()-t0):.2f} ms")
