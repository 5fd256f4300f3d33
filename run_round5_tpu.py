"""Round-5 TPU evidence driver (VERDICT round-4 "Next round" items).

Stages (resumable via markers under bench_logs/r5/state/, preflight
gates the rest — the run_round4_tpu.py pattern):

  preflight: lowering/compile + one launch of every NEW kernel variant
             at production geometry: bf16-traj iteration, bf16-policy
             iteration, both combined.  (The attribution probes carry
             their own per-variant try/except in the attr stage.)
  attr:      rollout-kernel time attribution (verdict item 2):
             bench_rollout_attr.py — full vs sim_only / policy_only /
             no_traj / no_prng probes, the bf16-matmul and bf16-traj
             levers, and a T-sweep.
  bf16time:  chained + chunked ms/iter of the bf16-traj iteration at
             8192 and 65536 vs the f32 default (verdict item 1 timing;
             target <= 2.0 ms chunked at 8192).
  bf16ab:    2000-iteration same-seed convergence A/B at 8192 on the
             canonical task: f32 default vs bf16-traj vs bf16-policy
             vs both (the default-flip gate, same methodology as the
             round-3/4 shuffle-block decision).
  fullrule:  verdict item 4 — the FULL basketball ruleset
             (one_on_one=False, tag_mode=False: baseline inbounds, OOB
             turnovers, 5-second violations, quarter rollover;
             /root/reference/src/game.cpp:941-946, 1084-1111,
             1116-1157, src/gen.cpp:221-236) for 2000 iterations at
             8192 on the round-4 default path (rollout kernel +
             fused GAE), with event telemetry proving the inbound
             machinery is exercised (scoredBaskets / oob / inbounding
             all nonzero and moving).
  compile:   verdict item 5 — where the 136-707 s fresh-process
             compile bill goes: per-kernel trace (lower) vs backend
             compile timings, plus T=1 vs T=32 and blk sweeps to test
             the "T=32 unroll" hypothesis (the tick loop is a GRID
             dimension, not an unroll — the data decides).
  headline:  final chunked production timing at 8192/65536 on
             whatever the bf16 decision picked, + bench.py's JSON.

Usage: python run_round5_tpu.py [--force] [stage ...]
"""

import pathlib
import sys
import time

import jax
import numpy as np

from madrona_basketball_tpu.utils.benching import (
    fetch_sync as fetch_scalar, run_chunked_train as run_chunked)

STATE_DIR = pathlib.Path("bench_logs/r5/state")
ALL_STAGES = ("preflight", "attr", "bf16time", "bf16ab", "fullrule",
              "compile", "headline")


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


def time_chunked(ti, ts, label, W, T, ch=100, rounds=3):
    from madrona_basketball_tpu.ppo.train import make_train_chunk
    chunk = make_train_chunk(ti, ch)
    t0 = time.perf_counter()
    ts, _ = chunk(ts)
    fetch_scalar(ts.sf)
    print(f"[{label}] chunk compile+first: {time.perf_counter() - t0:.1f}s",
          flush=True)
    best = float("inf")
    for rnd in range(rounds):
        t0 = time.perf_counter()
        ts, _ = chunk(ts)
        fetch_scalar(ts.sf)
        ms = (time.perf_counter() - t0) / ch * 1e3
        best = min(best, ms)
        print(f"[{label}] chunked round {rnd}: iter={ms:.2f} ms  "
              f"train_steps/s={W * T / ms * 1e3 / 1e6:.1f}M", flush=True)
    return ts, best


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

    def make(W, use_frozen=False, cfg_=None, trainee_idx=1, **kw):
        hp = PPOParams(num_envs=W, use_frozen=use_frozen,
                       trainee_idx=trainee_idx)
        c = cfg_ or cfg
        ts = init_fused_train_state(c, hp, net, jax.random.PRNGKey(SEED))
        ti = make_train_iteration_fused(c, hp, net, backend="pallas",
                                        rollout_kernel=True,
                                        fused_gae=True, **kw)
        return hp, ts, ti

    failures = []

    def stage(name):
        def deco(fn):
            if name not in stages:
                return fn
            marker = STATE_DIR / f"{name}.done"
            if marker.exists() and not force:
                print(f"[round5-tpu] STAGE {name} already done "
                      f"({marker}); skipping", flush=True)
                return fn
            if "preflight" in failures:
                failures.append(name)
                print(f"[round5-tpu] STAGE {name} SKIPPED: preflight "
                      f"failed", flush=True)
                return fn
            t0 = time.perf_counter()
            try:
                fn()
            except Exception as e:            # noqa: BLE001
                failures.append(name)
                print(f"[round5-tpu] STAGE {name} FAILED: {e!r}",
                      flush=True)
            else:
                marker.write_text(f"completed in "
                                  f"{time.perf_counter() - t0:.0f}s\n")
                print(f"[round5-tpu] STAGE {name} ok "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            return fn
        return deco

    @stage("preflight")
    def _preflight():
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

        for label, kw in (("iter-bf16traj", dict(bf16_traj=True)),
                          ("iter-bf16policy", dict(bf16_policy=True)),
                          ("iter-bf16both", dict(bf16_traj=True,
                                                 bf16_policy=True))):
            def run(kw=kw):
                _, ts, ti = make(8192, use_frozen=True, **kw)
                ts, _m = ti(ts)
                fetch_scalar(ts.sf)
            check(label, run)

        # the full-ruleset config compiles a different sim tick
        # (inbound machinery live) — fail fast here, not 3 stages in
        def run_fullrule():
            c = SimConfig(one_on_one=False, tag_mode=False)
            _, ts, ti = make(8192, cfg_=c, trainee_idx=0)
            ts, _m = ti(ts)
            fetch_scalar(ts.sf)
        check("iter-fullrule", run_fullrule)

        if errs:
            raise RuntimeError(f"preflight lowering failures: {errs}")

    @stage("attr")
    def _attr():
        import bench_rollout_attr
        bench_rollout_attr.main(W=8192)

    @stage("bf16time")
    def _bf16time():
        for W in (8192, 65536):
            _, ts, ti = make(W, use_frozen=True, bf16_traj=True)
            hp = PPOParams(num_envs=W, use_frozen=True)
            ts, _ = time_iter(ti, ts, f"bf16-iter-{W}", W,
                              hp.num_rollout_steps)
            time_chunked(ti, ts, f"bf16-{W}", W, hp.num_rollout_steps)
        # same-session f32 reference point at 8192 for the decision row
        _, ts, ti = make(8192, use_frozen=True)
        hp = PPOParams(num_envs=8192, use_frozen=True)
        ts, _ = time_iter(ti, ts, "f32-iter-8192", 8192,
                          hp.num_rollout_steps)
        time_chunked(ti, ts, "f32-8192", 8192, hp.num_rollout_steps)

    @stage("bf16ab")
    def _bf16ab():
        # same seed, same canonical task (defender trainee, no frozen),
        # 2000 iterations each — the shuffle-block decision methodology.
        for label, kw in (("ab-f32", {}),
                          ("ab-bf16traj", dict(bf16_traj=True)),
                          ("ab-bf16policy", dict(bf16_policy=True)),
                          ("ab-bf16both", dict(bf16_traj=True,
                                               bf16_policy=True))):
            hp, ts, ti = make(8192, **kw)
            chunk = make_train_chunk(ti, CH)
            run_chunked(ts, chunk, 2000, label, 8192,
                        hp.num_rollout_steps, CH)

    @stage("fullrule")
    def _fullrule():
        from madrona_basketball_tpu.ops import layout
        c = SimConfig(one_on_one=False, tag_mode=False)
        # offense trainee (agent 0) so shooting / scoring / inbounds
        # are exercised by the learner itself; the defender runs the
        # in-sim hardcoded defense (src/game.cpp:525-532 disabled in
        # non-tag mode).
        hp, ts, ti = make(8192, cfg_=c, trainee_idx=0)
        chunk = make_train_chunk(ti, CH)
        r_b = layout.F_IDX["sbaskets"]
        r_o = layout.F_IDX["oob"]
        r_i = layout.I_IDX["ginb"]
        r_p = layout.F_IDX["period"]
        t0 = time.perf_counter()
        for done in range(CH, 2001, CH):
            ts, st = chunk(ts)
            rew = float(np.asarray(jax.device_get(
                st["mean_reward"][-1])))
            ln = float(np.asarray(jax.device_get(
                st["mean_episode_length"][-1])))
            sb = float(np.asarray(jax.device_get(
                ts.sf[r_b])).mean())
            oob = float(np.asarray(jax.device_get(
                ts.sf[r_o])).mean())
            inb = float(np.asarray(jax.device_get(
                ts.si[r_i])).mean())
            per = float(np.asarray(jax.device_get(
                ts.sf[r_p])).mean())
            print(f"[fullrule] iter {done}: reward {rew:.1f} len "
                  f"{ln:.1f} baskets/world {sb:.2f} oob/world {oob:.2f} "
                  f"inbounding {inb:.3f} period {per:.2f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        finite = all(np.isfinite(np.asarray(jax.device_get(x))).all()
                     for x in jax.tree.leaves(ts.agent.params))
        print(f"[fullrule] DONE params_finite={finite}", flush=True)

    @stage("compile")
    def _compile():
        # Where does the fresh-process compile bill go?  Each component
        # is measured in its OWN subprocess: the axon path pays the full
        # remote compile per process, while in-process rebuilds reuse
        # executables by HLO hash and read near-zero (the first version
        # of this stage measured exactly that artifact).
        import subprocess
        for comp in ("rollout32", "rollout1", "gae", "update", "iter",
                     "chunk"):
            r = subprocess.run(
                [sys.executable, "bench_compile_fresh.py", comp],
                capture_output=True, text=True, timeout=3600)
            for ln in (r.stdout + r.stderr).splitlines():
                if "[compile-fresh]" in ln:
                    print(ln, flush=True)
            if r.returncode != 0:
                print(f"[compile] {comp} FAILED rc={r.returncode}: "
                      f"{r.stderr.splitlines()[-1] if r.stderr else ''}",
                      flush=True)

    @stage("headline")
    def _headline():
        # final production numbers (run AFTER the bf16 decision is read
        # from bf16ab/bf16time and the default flipped or kept)
        for W in (8192, 65536):
            hp = PPOParams(num_envs=W, use_frozen=True)
            _, ts, ti = make(W, use_frozen=True)
            time_chunked(ti, ts, f"final-{W}", W, hp.num_rollout_steps)

    print(f"[round5-tpu] stages complete; failures: "
          f"{failures or 'none'}", flush=True)
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
