"""In-program decomposition from a real device trace (jax.profiler):
capture N iterations of the production fused-GAE iteration, load the
xplane with jax.profiler.ProfileData, and aggregate device-plane event
durations per iteration.  Unlike bench_r3_decomp.py (isolated chained
dispatches, each paying its own launch latency), these are the times
the phases take INSIDE the running program.

Usage: python bench_trace_decomp.py [num_envs] [iters]
"""
import collections
import glob
import sys
import time

import jax
import numpy as np


def main():
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state, make_train_iteration_fused)

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cfg = SimConfig()
    hp = PPOParams(num_envs=W, use_frozen=True)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
    ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                    rollout_kernel=True, fused_gae=True)
    t0 = time.perf_counter()
    ts, _ = ti(ts)
    np.asarray(jax.device_get(ts.sf[:1, :1]))
    print(f"compile+first: {time.perf_counter() - t0:.1f}s", flush=True)

    logdir = "/tmp/mbtpu_trace_decomp"
    jax.profiler.start_trace(logdir)
    for _ in range(N):
        ts, _ = ti(ts)
    np.asarray(jax.device_get(ts.sf[:1, :1]))
    jax.profiler.stop_trace()

    paths = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane under {logdir}"
    pd = jax.profiler.ProfileData.from_file(paths[-1])
    by_name = collections.Counter()
    counts = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                ns = ev.duration_ns
                by_name[ev.name] += ns
                counts[ev.name] += 1
    total = sum(by_name.values())
    print(f"[trace-decomp] W={W} iters={N} device-plane total "
          f"{total / N / 1e6:.3f} ms/iter over {len(by_name)} "
          f"distinct events", flush=True)
    for name, ns in by_name.most_common(25):
        print(f"  {ns / N / 1e6:8.3f} ms/iter x{counts[name] // N:4d}  "
              f"{name[:110]}", flush=True)


if __name__ == "__main__":
    main()
