"""Update-kernel block-width (wb) sweep on the full fused iteration.

BENCHMARKS.md round 5 attributes the update kernel's slack vs its ITS
floor to per-grid-step pipeline cost (512 steps x ~2.1 us at wb=2048,
W=8192).  Wider blocks cut the step count proportionally: wb=4096 ->
256 steps, wb=8192 -> 128.  The cap was 2048 by construction
(ops/fused_update.pick_update_block), never measured upward — this
sweep decides it with data, per variant: chained + chunked(100)
timing of the production fused iteration (rollout kernel + fused GAE)
at 8192 envs.  A scoped-VMEM overflow prints a one-line skip (the
bench_rollout_blk.py convention).

Coarser wb also coarsens the epoch-shuffle granularity (PARITY.md
deviation #1: tick-blocks of wb worlds are permuted, not samples) —
a timing win here gates a 2000-iteration convergence A/B before any
default flip, same methodology as the round-4/5 decisions.

Usage: python bench_update_wb.py [envs] [wb ...]
"""

import sys
import time

import jax

from madrona_basketball_tpu.utils.benching import fetch_sync


def main():
    args = [a for a in sys.argv[1:]]
    W = int(args[0]) if args else 8192
    wbs = [int(a) for a in args[1:]] or [2048, 4096, 8192]

    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train import make_train_chunk
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state, make_train_iteration_fused)
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()

    cfg = SimConfig()
    net, _ = init_agent(jax.random.PRNGKey(0))

    for wb in wbs:
        hp = PPOParams(num_envs=W, use_frozen=True, update_block=wb)
        if W % wb or hp.minibatch_size % wb:
            print(f"[wb-sweep] wb={wb} skipped: does not divide "
                  f"num_envs={W} / minibatch={hp.minibatch_size}",
                  flush=True)
            continue
        ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(2))
        ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                        rollout_kernel=True, fused_gae=True)
        label = f"wb={wb}"
        try:
            t0 = time.perf_counter()
            ts, _ = ti(ts)
            fetch_sync(ts.sf)
            print(f"[wb-sweep] {label} compile+first: "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "vmem" in msg.lower():
                reason = "scoped-VMEM limit"
            elif "remote_compile" in msg or "INTERNAL" in msg:
                reason = "backend compile failure"
            else:
                raise
            print(f"[wb-sweep] {label} skipped: {reason} "
                  f"({msg.splitlines()[0][:120]})", flush=True)
            continue
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(20):
                ts, _ = ti(ts)
            fetch_sync(ts.sf)
            samples.append((time.perf_counter() - t0) / 20)
        best = min(samples)
        print(f"[wb-sweep] {label} chained iter={best * 1e3:.2f} ms  "
              f"samples_ms={[round(s * 1e3, 2) for s in samples]}",
              flush=True)
        chunk = make_train_chunk(ti, 100)
        ts, _ = chunk(ts)
        fetch_sync(ts.sf)
        best_c = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            ts, _ = chunk(ts)
            fetch_sync(ts.sf)
            best_c = min(best_c, (time.perf_counter() - t0) / 100)
        print(f"[wb-sweep] {label} chunked iter={best_c * 1e3:.2f} ms  "
              f"train_steps/s="
              f"{W * hp.num_rollout_steps / best_c / 1e6:.1f}M", flush=True)


if __name__ == "__main__":
    main()
