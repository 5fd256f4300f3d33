import time, jax, jax.numpy as jnp, numpy as np
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.models import agent as agent_lib
from madrona_basketball_tpu.models import action as action_dist
from madrona_basketball_tpu.models.normalize import rms_normalize
from madrona_basketball_tpu import constants as Cn

net, ap = init_agent(jax.random.PRNGKey(0))
obs = jax.random.normal(jax.random.PRNGKey(1), (8192, 128))

def scan32(label, body):
    @jax.jit
    def run(key):
        def b(key, _):
            key, k = jax.random.split(key)
            return key, body(k)
        return jax.lax.scan(b, key, None, length=32)
    out = run(jax.random.PRNGKey(2))
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(3))
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best/32*1e6:.0f} us/iter")

scan32("split only", lambda k: k.sum())
scan32("normalize only", lambda k: rms_normalize(ap.obs_rms, obs).sum())
scan32("net.apply only", lambda k: sum(x.sum() for x in net.apply(ap.params, obs)))
scan32("norm+apply", lambda k: sum(x.sum() for x in net.apply(
    ap.params, rms_normalize(ap.obs_rms, obs))))
logits = jax.random.normal(jax.random.PRNGKey(5), (8192, 19))
scan32("sample only", lambda k: sum(x.sum() for x in
       action_dist.sample(k, logits, Cn.ACTION_BUCKETS)))
scan32("full forward", lambda k: sum(x.sum() for x in
       agent_lib.forward(net, ap, obs, k)))
