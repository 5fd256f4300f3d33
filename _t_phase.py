import time, functools, jax, jax.numpy as jnp, numpy as np
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo import train_fused as TF
from madrona_basketball_tpu.models import agent as agent_lib
from madrona_basketball_tpu.engine_fused import make_noise_fn
from madrona_basketball_tpu.ops.fused_step import make_fused_step
from madrona_basketball_tpu.ops import layout
from madrona_basketball_tpu import constants as Cn, engine

cfg = SimConfig()
hp = PPOParams(num_envs=8192, num_rollout_steps=32)
net, _ = init_agent(jax.random.PRNGKey(0))
ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))

def timeit(label, fn, *args, n=10):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)[:1] if hasattr(leaf, 'shape') else None
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{label}: {best*1e3:.2f} ms")
    return out

# 1. bare sim scan: 32 kernel steps + noise, no policy
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
timeit("sim-only 32 steps", sim_only, ts.env_keys, ts.sf, ts.si)

# 2. noise only
@jax.jit
def noise_only(keys):
    def body(keys, _):
        keys, noise = noise_fn(keys)
        return keys, noise.sum()
    return jax.lax.scan(body, keys, None, length=32)
timeit("noise-only 32 steps", noise_only, ts.env_keys)

# 3. policy forward only (32 steps, same obs)
obs0 = ts.obs[:128].T
@jax.jit
def policy_only(agent, obs, key):
    def body(key, _):
        key, k = jax.random.split(key)
        a, lp, v = agent_lib.forward(net, agent, obs, k)
        return key, (a.sum(), lp.sum(), v.sum())
    return jax.lax.scan(body, key, None, length=32)
timeit("policy-only 32 fwd", policy_only, ts.agent, obs0, jax.random.PRNGKey(3))

# 4. full rollout+gae+update via real iteration pieces: time full iter for reference
it = TF.make_train_iteration_fused(cfg, hp, net, backend="pallas")
def run_it(ts):
    ts2, m = it(ts)
    return ts2
ts = timeit("full train iter", run_it, ts, n=5)
