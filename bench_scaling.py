"""Weak-scaling sweep over the data mesh (BASELINE config 5).

For n = 1, 2, 4, ... available devices, runs (a) fused sim stepping under
shard_map and (b) the full fused PPO train iteration, with a FIXED number
of worlds per device, and reports env-steps/s plus efficiency relative to
the single-device rate.  On a pod slice run `jax.distributed.initialize()`
per host first and this sweeps across hosts over ICI/DCN; on one chip it
degrades to the n=1 row; on CPU set
`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8`
to validate the mechanics on a virtual 8-device mesh.

Prints one JSON line per n:
  {"devices": n, "worlds": W, "sim_steps_per_sec": ..,
   "train_env_steps_per_sec": .., "sim_efficiency": ..,
   "train_efficiency": ..}
On TPU each line additionally carries "multistep_steps_per_sec" — the
held-action multi-step kernel under shard_map (omitted elsewhere; the
on-chip PRNG is Mosaic-only).

Timing is chained-launch, fetch-synced (see bench.py for why).
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np


def _fetch(x):
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1]))


def sweep(per_device_worlds: int = 4096, rollout_steps: int = 32,
          sim_steps: int = 500, reps: int = 3):
    import functools

    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from madrona_basketball_tpu import DEFAULT_CONFIG, engine
    from madrona_basketball_tpu.engine_fused import make_noise_fn
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ops import layout
    from madrona_basketball_tpu.ops.fused_step import (fused_step_xla,
                                                       make_fused_step)
    from madrona_basketball_tpu.parallel.mesh import (
        make_mesh, shard_fused_train_state)
    from madrona_basketball_tpu.ppo import train_fused as TF
    from madrona_basketball_tpu.ppo.hparams import PPOParams

    cfg = DEFAULT_CONFIG
    devices = jax.devices()
    on_tpu = devices[0].platform == "tpu"
    if not on_tpu:
        print(
            "WARNING: non-TPU platform — the 'devices' below are VIRTUAL "
            "(one host's cores multiplexed), so the efficiency columns "
            "measure only partitioning overhead on fixed compute.  This "
            "mode validates the sharding MECHANICS; it is NOT a scaling "
            "measurement and its efficiency numbers must not be read as "
            "one.  See BENCHMARKS.md 'Multi-chip scaling' for the "
            "collective-cost model that addresses BASELINE config 5.",
            file=sys.stderr, flush=True)
    net, _ = init_agent(jax.random.PRNGKey(0))

    sizes = []
    n = 1
    while n <= len(devices):
        sizes.append(n)
        n *= 2
    if sizes[-1] != len(devices):
        sizes.append(len(devices))  # always include the full mesh

    base_sim = base_train = None
    for n in sizes:
        mesh = make_mesh(devices[:n])
        W = per_device_worlds * n

        # ---- (a) sim stepping: fused kernel in a scan under shard_map ----
        kern = make_fused_step(cfg, per_device_worlds) if on_tpu else \
            functools.partial(fused_step_xla, cfg)
        row = P(None, "data")
        kern_sharded = shard_map(kern, mesh=mesh,
                                 in_specs=(row, row, row),
                                 out_specs=(row, row, row),
                                 check_vma=False)
        noise_fn = make_noise_fn(cfg)

        @jax.jit
        def scan_steps(keys, sf, si):
            def body(carry, _):
                keys, sf, si = carry
                keys, noise = noise_fn(keys)
                sf, si, _obs = kern_sharded(sf, si, noise)
                return (keys, sf, si), ()
            return jax.lax.scan(body, (keys, sf, si), None,
                                length=sim_steps)[0]

        st = engine.init_batch(cfg, jax.random.PRNGKey(0), W)
        sf, si = layout.pack(st)
        sf = jax.device_put(sf, NamedSharding(mesh, row))
        si = jax.device_put(si, NamedSharding(mesh, row))
        keys = jax.device_put(st.key, NamedSharding(mesh, P("data", None)))
        carry = scan_steps(keys, sf, si)
        _fetch(carry)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            carry = scan_steps(*carry)
            _fetch(carry)
            best = min(best, time.perf_counter() - t0)
        sim_rate = sim_steps * W / best

        # ---- (a2) held-action stepping: multi-step kernel under
        # shard_map (TPU only: the kernel draws on-chip PRNG noise;
        # each shard offsets the seed by its mesh position) ----
        ms_rate = 0.0
        if on_tpu:
            from madrona_basketball_tpu.ops.fused_step import \
                make_fused_multistep
            K = 2000
            # honest workload: obs + blanked trainee actions every tick
            ms_kern = make_fused_multistep(cfg, per_device_worlds, K,
                                           obs_every_tick=True,
                                           blank_agent=0)

            def ms_local(seed, sf, si):
                shard_seed = seed + jax.lax.axis_index("data") * 7919
                return ms_kern(shard_seed, sf, si)

            ms_sharded = jax.jit(shard_map(
                ms_local, mesh=mesh, in_specs=(P(), row, row),
                out_specs=(row, row, row), check_vma=False))
            import jax.numpy as jnp
            seed = jnp.zeros((1,), jnp.int32)
            msf, msi, _ = ms_sharded(seed, sf, si)
            _fetch(msf)
            best = float("inf")
            for r in range(reps):
                t0 = time.perf_counter()
                msf, msi, _ = ms_sharded(seed + r + 1, msf, msi)
                _fetch(msf)
                best = min(best, time.perf_counter() - t0)
            ms_rate = K * W / best

        # ---- (b) full fused PPO train iteration ----
        hp = PPOParams(num_envs=W, num_rollout_steps=rollout_steps)
        ts = shard_fused_train_state(
            TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1)),
            mesh)
        # the production training path: policy-in-the-loop rollout
        # kernel + fused gradient kernel (TPU only)
        it = TF.make_train_iteration_fused(
            cfg, hp, net, backend="pallas" if on_tpu else "xla", mesh=mesh,
            rollout_kernel=on_tpu)
        ts, _m = it(ts)
        _fetch(ts.agent.params)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            ts, _m = it(ts)
            _fetch(ts.agent.params)
            best = min(best, time.perf_counter() - t0)
        train_rate = W * rollout_steps / best

        # ---- (c) dp-update train iteration (TPU only: the flagship
        # Pallas path; the psum-synced learner of BASELINE config 5 —
        # trajectory stays on its shard, ~21 KB gradient psum per
        # minibatch).  At n=1 this reads the dp machinery's overhead
        # over the flagship phase kernel. ----
        dp_rate = 0.0
        if on_tpu:
            hp_dp = PPOParams(num_envs=W, num_rollout_steps=rollout_steps)
            ts_dp = shard_fused_train_state(
                TF.init_fused_train_state(cfg, hp_dp, net,
                                          jax.random.PRNGKey(1)), mesh)
            it_dp = TF.make_train_iteration_fused(
                cfg, hp_dp, net, backend="pallas", mesh=mesh,
                rollout_kernel=True, fused_gae=True, dp_update=True)
            ts_dp, _m = it_dp(ts_dp)
            _fetch(ts_dp.agent.params)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                ts_dp, _m = it_dp(ts_dp)
                _fetch(ts_dp.agent.params)
                best = min(best, time.perf_counter() - t0)
            dp_rate = W * rollout_steps / best

        base_sim = base_sim or sim_rate
        base_train = base_train or train_rate
        rec = {
            "devices": n, "worlds": W,
            "sim_steps_per_sec": round(sim_rate, 1),
            "train_env_steps_per_sec": round(train_rate, 1),
            "sim_efficiency": round(sim_rate / (base_sim * n), 3),
            "train_efficiency": round(train_rate / (base_train * n), 3),
        }
        if ms_rate:
            rec["multistep_steps_per_sec"] = round(ms_rate, 1)
        if dp_rate:
            rec["dp_train_env_steps_per_sec"] = round(dp_rate, 1)
        print(json.dumps(rec))


if __name__ == "__main__":
    # Without this, the deployment image's site hook re-asserts the axon
    # TPU platform over JAX_PLATFORMS=cpu and the virtual 8-device CPU
    # sweep silently degrades to the 1-real-chip row.
    from madrona_basketball_tpu.utils.profiling import honor_platform_env
    honor_platform_env()
    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    sweep(worlds)
