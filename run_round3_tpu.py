"""Round-3 TPU evidence driver — one process, sequential, so the
expensive axon remote compiles are paid once per distinct jit signature
and everything lands in one log.

Stages (each prints immediately; all fetch-synced):
  conv:    600 iters @ 8192, rollout kernel + one-launch fused update
           phase (default update_block) — cliff-crossing learning-curve
           evidence for the round-3 shuffle granularity
           (PARITY.md deviation #1).
  ab:      600 iters @ 8192 with fused_grads=False (the round-2
           materialized-gather update, shuffle_block=8) — the A/B arm,
           same seed, everything else equal.
  gaeconv: 600 iters @ 8192 with the fused-GAE iteration, same
           seed/task as conv, plus its ms/iter.
  soak8k:  continue conv's trainer to 10 000 total iterations; assert
           finite params + report the plateau (VERDICT round-2 item 9a).
  soak65k: 2 000 iterations @ 65536 envs (4.3 B env-steps) with the
           same trainer; finite params + plateau (VERDICT round-2
           item 9b) + ms/iter at that scale.
  scale:   ms/iter at 16384 and 32768 for the scaling table.
  jax512:  2 000 iterations @ 512 envs, seed 2 — the JAX arm of the
           self-contained torch-vs-JAX convergence overlay (VERDICT
           round-2 item 7; torch arm: crosscheck/torch_ppo.py
           --num-envs 512 --num-iterations 2000 --seed 2).

Usage: python run_round3_tpu.py [stage ...]   (default: all; unknown
stage names are an error, NOT a silent no-op)
"""

import sys
import time

import jax
import numpy as np


def fetch_scalar(x):
    return float(np.asarray(jax.device_get(x.reshape(-1)[:1])))


def run_chunked(ts, chunk, iters, label, W, T, ch=100):
    t0 = time.perf_counter()
    done = 0
    last = (0.0, 0.0)
    while done < iters:
        ts, stacked = chunk(ts)
        done += ch
        r = float(np.asarray(jax.device_get(stacked["mean_reward"][-1])))
        ln = float(np.asarray(jax.device_get(
            stacked["mean_episode_length"][-1])))
        last = (r, ln)
        print(f"[{label}] iter {done}: reward {r:.1f} len {ln:.1f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    finite = all(np.isfinite(np.asarray(jax.device_get(x))).all()
                 for x in jax.tree.leaves(ts.agent.params))
    fps = done * W * T / (time.perf_counter() - t0)
    print(f"[{label}] DONE {done} iters reward {last[0]:.1f} len "
          f"{last[1]:.1f} params_finite={finite} "
          f"sustained {fps / 1e6:.1f}M steps/s incl. compile", flush=True)
    return ts


def time_iter(ti, ts, label, W, T, reps=20):
    t0 = time.perf_counter()
    ts, m = ti(ts)
    fetch_scalar(ts.sf)
    print(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            ts, m = ti(ts)
        fetch_scalar(ts.sf)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"[{label}] iter={best * 1e3:.2f} ms  "
          f"train_steps/s={W * T / best / 1e6:.1f}M", flush=True)
    return ts


ALL_STAGES = {"conv", "ab", "gaeconv", "soak8k", "soak65k", "scale",
              "jax512"}


def main():
    stages = set(sys.argv[1:]) or set(ALL_STAGES)
    unknown = stages - ALL_STAGES
    if unknown:
        sys.exit(f"unknown stage(s) {sorted(unknown)}; "
                 f"valid: {sorted(ALL_STAGES)}")
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train import make_train_chunk
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state, make_train_iteration_fused)

    cfg = SimConfig()
    net, _ = init_agent(jax.random.PRNGKey(0))
    SEED = 2
    CH = 100

    def make(W, fused_grads=True, use_frozen=False, fused_gae=False):
        # Learning-curve stages run the canonical task (defender trainee,
        # opponent driven by the in-sim hardCodeDefense — the reference's
        # shape when training without a frozen checkpoint, and the task the
        # torch overlay arm and the round-2 plateau band were measured on).
        # Throughput stages pass use_frozen=True to match the round-2
        # frozen-opponent scaling table's workload shape.
        hp = PPOParams(num_envs=W, use_frozen=use_frozen)
        ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(SEED))
        ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                        rollout_kernel=True,
                                        fused_grads=fused_grads,
                                        fused_gae=fused_gae)
        return hp, ts, ti

    failures = []

    def stage(*names):
        """Isolate each stage: a compile/runtime failure in one must not
        take down the rest of the evidence suite (they share this
        process to share the remote-compile warmup)."""
        def deco(fn):
            requested = stages & set(names)
            if requested:
                label = "+".join(sorted(requested))
                try:
                    fn()
                except Exception as e:            # noqa: BLE001
                    failures.append(label)
                    print(f"[round3-tpu] STAGE {label} FAILED: {e!r}",
                          flush=True)
            return fn
        return deco

    @stage("conv", "soak8k")
    def _conv():
        hp, ts, ti = make(8192)
        chunk = make_train_chunk(ti, CH)
        ts = run_chunked(ts, chunk, 600, "conv-fused", 8192,
                         hp.num_rollout_steps, CH)
        if "soak8k" in stages:
            run_chunked(ts, chunk, 9400, "soak-8192-cont", 8192,
                        hp.num_rollout_steps, CH)

    @stage("ab")
    def _ab():
        hp, ts, ti = make(8192, fused_grads=False)
        chunk = make_train_chunk(ti, CH)
        run_chunked(ts, chunk, 600, "conv-gather", 8192,
                    hp.num_rollout_steps, CH)

    @stage("gaeconv")
    def _gaeconv():
        # learning-curve validation of the fused-GAE iteration
        # (GAE + stats + obs moments in Pallas, normalization inside
        # the update kernel) — same seed/task as conv-fused
        hp, ts, ti = make(8192, fused_gae=True)
        chunk = make_train_chunk(ti, CH)
        ts = run_chunked(ts, chunk, 600, "conv-gae", 8192,
                         hp.num_rollout_steps, CH)
        time_iter(ti, ts, "iter-gae-8192", 8192, hp.num_rollout_steps)

    @stage("soak65k")
    def _soak65k():
        hp, ts, ti = make(65536, use_frozen=True)
        ts = time_iter(ti, ts, "iter-65536", 65536, hp.num_rollout_steps)
        chunk = make_train_chunk(ti, CH)
        run_chunked(ts, chunk, 2000, "soak-65536", 65536,
                    hp.num_rollout_steps, CH)

    @stage("jax512")
    def _jax512():
        hp, ts, ti = make(512)
        chunk = make_train_chunk(ti, CH)
        run_chunked(ts, chunk, 2000, "jax-512", 512,
                    hp.num_rollout_steps, CH)

    @stage("scale")
    def _scale():
        for W in (16384, 32768):
            hp, ts, ti = make(W, use_frozen=True)
            time_iter(ti, ts, f"iter-{W}", W, hp.num_rollout_steps)

    print(f"[round3-tpu] all stages complete; failures: "
          f"{failures or 'none'}", flush=True)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
