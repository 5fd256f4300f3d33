"""Round-4 TPU evidence driver.

Improvements over run_round3_tpu.py (VERDICT round-3 items 2/3/4/6/9):

  * `preflight` runs FIRST: compiles + executes ONE launch of every
    kernel variant at PRODUCTION block geometry (W=8192, T=32) so a
    Mosaic lowering error (e.g. round 3's math.powf legalization and
    the (32, 1, 1024) sublane-rule block) surfaces in minutes, not
    inside a 600-iteration evidence stage.
  * per-stage completion markers under bench_logs/r4/state/: rerunning
    the driver after a tunnel outage or kill skips finished stages
    (the round-3 axon outage cost the whole suite; now it costs one
    stage).  Delete a marker (or pass --force) to re-run a stage.
  * `headline` measures the 8192 train iteration BOTH ways — chained
    single-iteration dispatches (bench_train.py's method, the one that
    captured the irreproducible 63.10 ms) and the chunked
    100-iters-per-dispatch scan (the production dispatch shape of
    every long stage) — three times each, so the number carries its
    observed variance instead of a single capture.

Stages (each isolated; failures collected, exit 1 at the end):
  preflight: lowering/compile check of every kernel variant @ 8192.
  gaeconv:   600 iters @ 8192 with the fused-GAE iteration (same
             seed/task as round 3's conv-fused) + its ms/iter — the
             round-3 flagship kernel's first full hardware run.
  headline:  reproducible 8192 ms/iter (see above) + block-pick dump.
  scale:     ms/iter at 16384 / 32768 / 65536 (frozen-opponent
             workload, matches the round-2/3 scaling table).
  ab2000:    the 8192 shuffle-granularity A/B run TO PLATEAU (2000
             iters/arm, same seed): default coarse-block fused update
             vs the materialized-gather sample-shuffle arm.
  tiled8k:   the docs/rollout_kernel_tiling.md decision gate at the
             iteration level: 2-D-tiled rollout vs the 1-D default,
             with and without the fused-GAE pass.
  scalegae:  fused-GAE variant at 16384 / 32768 / 65536 (the
             default-flip decision needs more than the 8192 point).

A preflight lowering failure aborts every later stage in the run (they
would each re-pay the multi-minute remote compile just to hit the same
Mosaic error); the skipped stages count as failures for the exit code.

Usage: python run_round4_tpu.py [--force] [stage ...]   (default: all;
unknown stage names are an error, NOT a silent no-op)
"""

import pathlib
import sys
import time

import jax

from madrona_basketball_tpu.utils.benching import (
    fetch_sync as fetch_scalar, run_chunked_train as run_chunked)

STATE_DIR = pathlib.Path("bench_logs/r4/state")


def time_iter(ti, ts, label, W, T, reps=20, rounds=3):
    t0 = time.perf_counter()
    ts, m = ti(ts)
    fetch_scalar(ts.sf)
    print(f"[{label}] compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    samples = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(reps):
            ts, m = ti(ts)
        fetch_scalar(ts.sf)
        samples.append((time.perf_counter() - t0) / reps)
    best = min(samples)
    print(f"[{label}] iter={best * 1e3:.2f} ms  "
          f"train_steps/s={W * T / best / 1e6:.1f}M  "
          f"samples_ms={[round(s * 1e3, 2) for s in samples]}", flush=True)
    return ts, best


ALL_STAGES = ("preflight", "gaeconv", "headline", "scale", "ab2000",
              "tiled8k", "scalegae")


def main():
    args = sys.argv[1:]
    force = "--force" in args
    stages = set(a for a in args if not a.startswith("--")) or set(ALL_STAGES)
    unknown = stages - set(ALL_STAGES)
    if unknown:
        sys.exit(f"unknown stage(s) {sorted(unknown)}; valid: "
                 f"{sorted(ALL_STAGES)}")
    STATE_DIR.mkdir(parents=True, exist_ok=True)

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

    def make(W, fused_grads=True, use_frozen=False, fused_gae=False,
             rollout_block=None, rollout_tiled=False):
        # Learning-curve stages run the canonical no-frozen task (the
        # round-2/3 plateau band and the torch overlay were measured on
        # it); throughput stages pass use_frozen=True to match the
        # frozen-opponent scaling-table workload.
        hp = PPOParams(num_envs=W, use_frozen=use_frozen)
        ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(SEED))
        ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                        rollout_kernel=True,
                                        fused_grads=fused_grads,
                                        fused_gae=fused_gae,
                                        rollout_block=rollout_block,
                                        rollout_tiled=rollout_tiled)
        return hp, ts, ti

    failures = []

    def stage(name):
        """Isolate + checkpoint each stage: a failure in one must not
        take down the rest, and a finished stage is skipped on re-run
        (markers under bench_logs/r4/state/)."""
        def deco(fn):
            if name not in stages:
                return fn
            marker = STATE_DIR / f"{name}.done"
            if marker.exists() and not force:
                print(f"[round4-tpu] STAGE {name} already done "
                      f"({marker}); skipping", flush=True)
                return fn
            if "preflight" in failures:
                # Every variant the stages run just failed to lower;
                # running them would re-pay the remote compile to hit
                # the same Mosaic error hours later.
                failures.append(name)
                print(f"[round4-tpu] STAGE {name} SKIPPED: preflight "
                      f"failed", flush=True)
                return fn
            t0 = time.perf_counter()
            try:
                fn()
            except Exception as e:            # noqa: BLE001
                failures.append(name)
                print(f"[round4-tpu] STAGE {name} FAILED: {e!r}", flush=True)
            else:
                marker.write_text(f"completed in "
                                  f"{time.perf_counter() - t0:.0f}s\n")
                print(f"[round4-tpu] STAGE {name} ok "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            return fn
        return deco

    @stage("preflight")
    def _preflight():
        """One compile + one real launch per kernel variant at the
        production geometry.  Interpret-mode tests structurally cannot
        catch Mosaic alignment/legalization errors — this can."""
        import jax.numpy as jnp
        from madrona_basketball_tpu.ops import fused_rollout as FR
        from madrona_basketball_tpu.ops.fused_step import make_fused_multistep

        W, T = 8192, 32
        errs = []

        def check(label, fn):
            t0 = time.perf_counter()
            try:
                fn()
                print(f"[preflight] {label}: ok "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            except Exception as e:            # noqa: BLE001
                errs.append(label)
                print(f"[preflight] {label}: FAILED {e!r}", flush=True)

        hp0, ts0, _ = make(W, use_frozen=True)
        mats = FR.pack_policy(ts0.agent) + FR.pack_policy(ts0.frozen)
        rng = jnp.zeros((1, 2), jnp.int32).at[0, 0].set(7)

        def rollout_1d():
            rk = FR.make_fused_rollout(cfg, W, T, trainee_idx=1,
                                       use_frozen=True)
            out = jax.jit(lambda sf, si, obs: rk(rng, sf, si, obs, *mats))(
                ts0.sf, ts0.si, ts0.obs)
            fetch_scalar(out[0])
        check("rollout-1d", rollout_1d)

        def rollout_tiled():
            rk = FR.make_fused_rollout_tiled(cfg, W, T, trainee_idx=1,
                                             use_frozen=True)
            out = jax.jit(lambda sf, si, obs: rk(rng, sf, si, obs, *mats))(
                ts0.sf, ts0.si, ts0.obs)
            fetch_scalar(out[0])
        check("rollout-tiled", rollout_tiled)

        def multistep():
            ms = jax.jit(make_fused_multistep(cfg, W, 64,
                                              obs_every_tick=True,
                                              blank_agent=1))
            out = ms(jnp.zeros((1,), jnp.int32), ts0.sf, ts0.si)
            fetch_scalar(out[0])
        check("multistep-64", multistep)

        def iter_default():
            _, ts, ti = make(W, use_frozen=True)
            ts, _m = ti(ts)
            fetch_scalar(ts.sf)
        check("iter-default(rollout+one-launch-update)", iter_default)

        def iter_gae():
            _, ts, ti = make(W, use_frozen=True, fused_gae=True)
            ts, _m = ti(ts)
            fetch_scalar(ts.sf)
        check("iter-fused-gae", iter_gae)

        if errs:
            raise RuntimeError(f"preflight lowering failures: {errs}")

    @stage("gaeconv")
    def _gaeconv():
        # The fused-GAE iteration's first full hardware validation:
        # learning curve on the canonical task + its ms/iter (the
        # round-3 run failed to lower; the fixed kernel has only run
        # in interpret mode until now).  Recipe being fused:
        # /root/reference/scripts/ppo.py:144-177.
        hp, ts, ti = make(8192, fused_gae=True)
        chunk = make_train_chunk(ti, CH)
        ts = run_chunked(ts, chunk, 600, "conv-gae", 8192,
                         hp.num_rollout_steps, CH)
        time_iter(ti, ts, "iter-gae-8192", 8192, hp.num_rollout_steps)

    @stage("headline")
    def _headline():
        from madrona_basketball_tpu.ops.fused_update import pick_update_block
        hp, ts, ti = make(8192, use_frozen=True)
        print(f"[headline] update_block="
              f"{hp.update_block or pick_update_block(8192, hp.minibatch_size)}"
              f" minibatch={hp.minibatch_size}", flush=True)
        # (a) chained single-iteration dispatches, 3 independent rounds
        ts, _ = time_iter(ti, ts, "iter-8192-chained", 8192,
                          hp.num_rollout_steps, reps=20, rounds=3)
        # (b) chunked: 100 iterations per dispatch (the shape every long
        # evidence stage actually runs) — wall/iter has no per-dispatch
        # tunnel latency in it
        chunk = make_train_chunk(ti, CH)
        t0 = time.perf_counter()
        ts, _st = chunk(ts)
        fetch_scalar(ts.sf)
        print(f"[headline] chunk compile+first: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        for rnd in range(3):
            t0 = time.perf_counter()
            ts, _st = chunk(ts)
            fetch_scalar(ts.sf)
            ms = (time.perf_counter() - t0) / CH * 1e3
            sps = 8192 * hp.num_rollout_steps / ms * 1e3 / 1e6
            print(f"[headline] chunked round {rnd}: iter={ms:.2f} ms  "
                  f"train_steps/s={sps:.1f}M", flush=True)

    @stage("scale")
    def _scale():
        for W in (16384, 32768, 65536):
            hp, ts, ti = make(W, use_frozen=True)
            time_iter(ti, ts, f"iter-{W}", W, hp.num_rollout_steps)

    @stage("ab2000")
    def _ab2000():
        # Both arms to plateau at the production scale (round 3's 600-
        # iteration cutoff left the gather arm still descending).  Same
        # seed, same task; the deviation this justifies is PARITY.md #1
        # vs /root/reference/scripts/ppo.py:186-216.
        hp, ts, ti = make(8192)
        chunk = make_train_chunk(ti, CH)
        run_chunked(ts, chunk, 2000, "ab-fused", 8192,
                    hp.num_rollout_steps, CH)
        hp, ts, ti = make(8192, fused_grads=False)
        chunk = make_train_chunk(ti, CH)
        run_chunked(ts, chunk, 2000, "ab-gather", 8192,
                    hp.num_rollout_steps, CH)

    @stage("tiled8k")
    def _tiled8k():
        # The docs/rollout_kernel_tiling.md decision gate, measured at
        # the iteration level: 2-D-tiled rollout vs the 1-D default,
        # with and without the fused-GAE pass.
        for tiled, gae in ((False, False), (True, False), (True, True)):
            hp, ts, ti = make(8192, use_frozen=True, fused_gae=gae,
                              rollout_tiled=tiled)
            time_iter(ti, ts,
                      f"iter-8192-tiled={int(tiled)}-gae={int(gae)}",
                      8192, hp.num_rollout_steps)

    @stage("scalegae")
    def _scalegae():
        # fused-GAE variant across the scaling table (the default-flip
        # decision needs more than the 8192 point).
        for W in (16384, 32768, 65536):
            hp, ts, ti = make(W, use_frozen=True, fused_gae=True)
            time_iter(ti, ts, f"iter-gae-{W}", W, hp.num_rollout_steps)

    print(f"[round4-tpu] all stages complete; failures: "
          f"{failures or 'none'}", flush=True)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
