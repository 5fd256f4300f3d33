"""Fresh-process compile-cost measurement for ONE component.

The axon remote-compile path does not persist executables across
processes (CLAUDE.md), so every fresh process pays the full compile —
the 136-707 s bill of BENCHMARKS.md round 4.  In-process timings are
polluted by XLA's executable reuse (a second build of the same program
costs ~nothing), so run_round5_tpu.py's `compile` stage spawns this
script once per component and reads the child's own split of
    trace (jax lower) | backend compile | first run + fetch
(the last flushes the tunnel's DEFERRED remote compile, which can make
`compile()` return early).

Usage: python bench_compile_fresh.py
           rollout32 | rollout1 | gae | update | iter | chunk  [W]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    comp = sys.argv[1]
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    t_start = time.perf_counter()
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ops import fused_rollout as FR
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train import make_train_chunk
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state, make_train_iteration_fused)
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    # every production entry point enables the persistent cache; the
    # axon remote path bypasses it, but the HOST-side init build
    # (host_init, train_fused.py) persists — so with this on, the init
    # column is first-process-only
    enable_compile_cache()
    t_import = time.perf_counter() - t_start

    # First-touch warmup: ONE trivial compile+execute+fetch.  The axon
    # tunnel pays a large, highly variable per-process bring-up on the
    # first real device round-trip; billing it separately keeps the
    # init column honest.
    t0 = time.perf_counter()
    np.asarray(jax.device_get(jnp.ones((8, 128), jnp.float32) * 2.0))
    t_warm = time.perf_counter() - t0

    cfg = SimConfig()
    net, _ = init_agent(jax.random.PRNGKey(0))
    hp = PPOParams(num_envs=W, use_frozen=True)
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
    mats = FR.pack_policy(ts.agent) + FR.pack_policy(ts.frozen)
    rng = jnp.zeros((1, 2), jnp.int32).at[0, 0].set(7)
    # flush any deferred device work from init so it isn't billed to
    # the component's own first-run column
    np.asarray(jax.device_get(ts.sf.reshape(-1)[:1]))
    t_setup = time.perf_counter() - t_start - t_import - t_warm

    if comp in ("rollout32", "rollout1"):
        T = 32 if comp == "rollout32" else 1
        rk = FR.make_fused_rollout(cfg, W, T, trainee_idx=1,
                                   use_frozen=True)
        fn = jax.jit(lambda sf, si, obs: rk(rng, sf, si, obs, *mats))
        args = (ts.sf, ts.si, ts.obs)
    elif comp == "gae":
        from madrona_basketball_tpu.ops import fused_gae as FG
        from madrona_basketball_tpu.ops import fused_update as FU  # noqa
        T = hp.num_rollout_steps
        gk = FG.make_fused_gae(T, W, hp.gamma, hp.gae_lambda,
                               FR.R_VALUE, FR.R_REW, FR.R_DONE)
        traj = jnp.zeros((T, FR.ROLL_ROWS, W), jnp.float32)
        carry = jnp.zeros((2, W), jnp.float32)
        nv = jnp.zeros((1, W), jnp.float32)
        vs = jnp.zeros((1, FG.VSTAT_COLS), jnp.float32)
        fn = jax.jit(gk)
        args = (traj, carry, nv, vs)
    elif comp == "update":
        from madrona_basketball_tpu.ops import fused_update as FU
        T = hp.num_rollout_steps
        D = FR.ROLL_OBS
        wb = FU.pick_update_block(W, hp.minibatch_size)
        ufp = FU.make_fused_update_phase(hp, D, T, W, wb, raw_side=True)
        n_blocks = T * (W // wb)
        # valid block ids are [0, n_blocks) PER EPOCH — a flat arange
        # over epochs*n_blocks sends the scalar-prefetch DMA out of
        # bounds (device fault on fetch)
        idx = jnp.tile(jnp.arange(n_blocks, dtype=jnp.int32),
                       hp.update_epochs)
        cnt = jnp.zeros((), jnp.int32)
        traj = jnp.zeros((T, FR.ROLL_ROWS, W), jnp.float32)
        side = jnp.zeros((T, FU.SIDE_ROWS, W), jnp.float32)
        nrm = jnp.zeros((2, D), jnp.float32)
        us = jnp.zeros((1, 8), jnp.float32)
        m = (jnp.zeros((32, D), jnp.float32), jnp.zeros((32, 32),
             jnp.float32), jnp.zeros((20, 32), jnp.float32),
             jnp.zeros((32, 8), jnp.float32))
        fn = jax.jit(ufp)
        args = (idx, cnt, traj, side, nrm, us) + m * 3
    elif comp == "iter":
        fn = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                        rollout_kernel=True,
                                        fused_gae=True)
        args = (ts,)
    elif comp == "chunk":
        ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                        rollout_kernel=True,
                                        fused_gae=True)
        fn = make_train_chunk(ti, 100)
        args = (ts,)
    else:
        sys.exit(f"unknown component {comp}")

    t0 = time.perf_counter()
    low = fn.lower(*args)
    t1 = time.perf_counter()
    ex = low.compile()
    t2 = time.perf_counter()
    out = ex(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))
    t3 = time.perf_counter()
    print(f"[compile-fresh] {comp:10s} W={W} import={t_import:5.1f}s "
          f"warmup={t_warm:5.1f}s init={t_setup:5.1f}s "
          f"trace={t1 - t0:6.1f}s backend={t2 - t1:6.1f}s "
          f"first-run+fetch={t3 - t2:6.1f}s total={t3 - t_start:6.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
