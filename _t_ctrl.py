import time, jax, jax.numpy as jnp, numpy as np
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.models import agent as agent_lib
from madrona_basketball_tpu.models.normalize import rms_normalize

net, ap = init_agent(jax.random.PRNGKey(0))

def bench(label, run, iters):
    out = run(jax.random.PRNGKey(2))
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(3))
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: total {best*1e3:.2f} ms, {best/iters*1e6:.0f} us/iter")

for L in (32, 256):
    @jax.jit
    def empty(key, L=L):
        def b(c, _):
            return c + 1, ()
        return jax.lax.scan(b, jnp.zeros(()), None, length=L)[0]
    bench(f"empty scan L={L}", empty, L)

for L in (32, 256):
    @jax.jit
    def splits(key, L=L):
        def b(key, _):
            key, k = jax.random.split(key)
            return key, ()
        return jax.lax.scan(b, key, None, length=L)[0]
    bench(f"split scan L={L}", splits, L)

obs0 = jax.random.normal(jax.random.PRNGKey(1), (8192, 128))
for L in (32, 256):
    @jax.jit
    def fwd(key, L=L):
        def b(carry, _):
            key, obs = carry
            key, k = jax.random.split(key)
            a, lp, v = agent_lib.forward(net, ap, obs, k)
            # feed something back so nothing is DCE'd / hoisted
            obs = obs + v[:, None] * 1e-9
            return (key, obs), ()
        (key, obs), _ = jax.lax.scan(b, (key, obs0), None, length=L)
        return obs
    bench(f"fwd scan L={L} (carried obs)", fwd, L)
