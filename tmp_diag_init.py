import time, jax, numpy as np
t0=time.perf_counter()
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.ppo.hparams import PPOParams
from madrona_basketball_tpu.ppo.train_fused import init_fused_train_state
from madrona_basketball_tpu.utils.profiling import enable_compile_cache
enable_compile_cache()
print(f"imports {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
np.asarray(jax.device_get(jax.numpy.ones((8,128))*2))
print(f"warmup {time.perf_counter()-t0:.1f}s", flush=True)
net,_ = init_agent(jax.random.PRNGKey(0))
hp = PPOParams(num_envs=8192, use_frozen=True)
t0=time.perf_counter()
ts = init_fused_train_state(SimConfig(), hp, net, jax.random.PRNGKey(1), host_init=True)
print(f"host build+transfer {time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
with jax.default_device(jax.devices("cpu")[0]):
    ts_cpu = jax.block_until_ready(init_fused_train_state(SimConfig(), hp, net, jax.random.PRNGKey(1), host_init=False))
print(f"cpu-only build {time.perf_counter()-t0:.1f}s", flush=True)
print("leaves:", len(jax.tree.leaves(ts_cpu)))
t0=time.perf_counter()
ts_dev = jax.block_until_ready(jax.device_put(ts_cpu, jax.devices()[0]))
print(f"transfer {time.perf_counter()-t0:.1f}s", flush=True)
print("devices of sf:", next(iter(ts_dev.sf.devices())))
