import time, jax, jax.numpy as jnp, numpy as np
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.models import agent as agent_lib
from madrona_basketball_tpu.models import action as action_dist
from madrona_basketball_tpu import constants as Cn

net, ap = init_agent(jax.random.PRNGKey(0))
obs = jax.random.normal(jax.random.PRNGKey(1), (8192, 128))

def timeit(label, fn, *args, n=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, (time.perf_counter()-t0)/n)
    print(f"{label}: {best*1e3:.3f} ms")

k = jax.random.PRNGKey(2)
timeit("fwd stochastic", jax.jit(lambda o, k: agent_lib.forward(net, ap, o, k)), obs, k)
timeit("fwd argmax", jax.jit(lambda o, k: agent_lib.forward(net, ap, o, k, stochastic=False)), obs, k)
logits = jnp.zeros((8192, 19))
timeit("sample alone", jax.jit(lambda l, k: action_dist.sample(k, l, Cn.ACTION_BUCKETS)), logits, k)
timeit("permutation 262144", jax.jit(lambda k: jax.random.permutation(k, 262144)), k)
timeit("split+fold", jax.jit(lambda k: jax.random.split(k, 3)), k)

# gather cost
big = jax.random.normal(jax.random.PRNGKey(3), (262144, 128))
idx = jax.random.randint(jax.random.PRNGKey(4), (65536,), 0, 262144)
timeit("gather 65536x128", jax.jit(lambda b, i: b[i]), big, idx)

# one grad step
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo import train_fused as TF
hp = PPOParams(num_envs=8192, num_rollout_steps=32)
o = big[:65536]; a = jnp.zeros((65536, 6), jnp.int32)
lp = jnp.zeros(65536); v = jnp.zeros(65536); adv = jnp.ones(65536); ret = jnp.zeros(65536)
def loss(params):
    lp_, ent, v_ = agent_lib.get_stats(net, ap.replace(params=params), o, a)
    return (jnp.exp(lp_-lp)*adv).mean() + ((v_-ret)**2).mean() - ent.mean()*0.01
timeit("grad step 65536", jax.jit(jax.grad(loss)), ap.params, n=10)
