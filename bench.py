"""Throughput benchmark — the equivalent of the reference's only perf
harness (`scripts/run.py`: blank-action env stepping FPS at N worlds).

Prints ONE JSON line:
  {"metric": "env_steps_per_sec_8192", "value": N, "unit": "steps/s",
   "vs_baseline": null}

(vs_baseline is null: the reference repo publishes no benchmark numbers —
BASELINE.json "published" == {}.)

Run on whatever jax.devices() provides (real TPU under the driver).

Timing methodology: every engine is timed over chained launches (each
launch consumes the previous launch's output) and synced by FETCHING a
scalar of the result, best of 3 tries.  A fetch cannot under-sync: through
a remote-device tunnel `block_until_ready` can return before the device
work is observable, which over-reports; a fetch includes one round-trip of
latency, which at worst under-reports slightly.

Engines measured (fastest wins the headline — every candidate executes
ALL 19 systems including fillObservations on EVERY tick, and re-blanks
the trainee's actions every tick, i.e. the exact scripts/run.py workload):
  * structured `jit(vmap(step))` pytree engine — host-dispatch loop
    (the literal scripts/run.py shape)
  * fused single-Pallas-kernel engine — host-dispatch loop
  * fused kernel inside `lax.scan` — the rollout shape (500 ticks/call)
  * multi-step kernel with obs_every_tick=True + blank_agent=0 — K ticks
    per launch, fleet state resident in VMEM, noise from the on-chip
    PRNG, observations computed and stored every tick, trainee actions
    zeroed every tick (TPU only)

A held-action variant of the multi-step kernel (obs materialized only on
the final tick — a DIFFERENT, lighter workload useful for eval bursts)
is reported to stderr as fused_multistep_heldobs_fps but intentionally
excluded from the headline.
"""

import json
import sys
import time

import jax


def _best_of(tries, run):
    best = float("inf")
    for _ in range(tries):
        best = min(best, run())
    return best


def _init_devices_or_die(timeout_s: float = 300.0):
    """jax.devices() with a watchdog: when the remote-TPU tunnel is down,
    device init HANGS (it does not error), which would hang the whole
    benchmark harness.  Fail fast with a diagnostic instead."""
    import os
    import threading

    # The image's site hook re-asserts the remote-device platform over
    # JAX_PLATFORMS; when the caller asked for the host platform (CPU
    # smoke runs), honor it via the config knob, which wins.
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")
    done = threading.Event()

    def watchdog():
        if not done.wait(timeout_s):
            print(f"bench.py: jax device init did not complete within "
                  f"{timeout_s:.0f}s — device tunnel down?  Aborting.",
                  file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()
    devices = jax.devices()
    done.set()
    return devices


def main(num_worlds: int = 8192, n_steps: int = 1000):
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    import numpy as np

    import jax.numpy as jnp
    from madrona_basketball_tpu import DEFAULT_CONFIG, engine
    from madrona_basketball_tpu.engine_fused import FusedEngine, make_noise_fn
    from madrona_basketball_tpu.ops.fused_step import (fused_step_xla,
                                                       make_fused_multistep,
                                                       make_fused_step)

    cfg = DEFAULT_CONFIG
    on_tpu = _init_devices_or_die()[0].platform == "tpu"

    def fetch(x):
        np.asarray(jax.device_get(x[:1, :1]))

    # --- structured jit(vmap(step)) engine, host-dispatch loop ---
    # Every candidate re-blanks the trainee's (agent 0) actions every
    # tick — the per-step action write scripts/run.py pays — not just
    # the multistep kernel (whose blank_agent=0 does it in-kernel).
    state = engine.init_batch(cfg, jax.random.PRNGKey(0), num_worlds)
    _step_fn = engine.make_step_fn(cfg)

    @jax.jit
    def step_fn(state):
        acts = state.agents.action.at[:, 0].set(0)
        return _step_fn(state.replace(
            agents=state.agents.replace(action=acts)))

    state = step_fn(state)
    fetch(state.agents.obs[:1])
    reps = max(1, n_steps // 4)

    def run_structured():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(reps):
            state = step_fn(state)
        fetch(state.agents.obs[:1])
        return time.perf_counter() - t0

    structured_fps = reps * num_worlds / _best_of(3, run_structured)

    # --- fused single-kernel engine (Pallas on TPU, XLA rows on CPU),
    # host-dispatch loop ---
    import functools

    from madrona_basketball_tpu.ops import layout
    eng = FusedEngine(cfg, num_worlds, seed=0,
                      backend="pallas" if on_tpu else "xla")
    noise_fn = make_noise_fn(cfg)
    kern = make_fused_step(cfg, num_worlds) if on_tpu else \
        functools.partial(fused_step_xla, cfg)
    _blank_rows = [layout.I_IDX[f"a0.{n}"] for n in
                   ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
                    "a_shoot")]

    def _blank(si):
        for r in _blank_rows:
            si = si.at[r].set(jnp.zeros((num_worlds,), jnp.int32))
        return si

    @jax.jit
    def fused_blank_step(keys, sf, si):
        keys, noise = noise_fn(keys)
        sf, si, obs = kern(sf, _blank(si), noise)
        return keys, sf, si

    dk, dsf, dsi = fused_blank_step(eng.keys, eng.sf, eng.si)
    fetch(dsf)

    def run_fused():
        nonlocal dk, dsf, dsi
        t0 = time.perf_counter()
        for _ in range(reps):
            dk, dsf, dsi = fused_blank_step(dk, dsf, dsi)
        fetch(dsf)
        return time.perf_counter() - t0

    fused_fps = reps * num_worlds / _best_of(3, run_fused)

    # --- fused kernel inside lax.scan: the rollout shape ---
    @jax.jit
    def scan_steps(keys, sf, si):
        def body(carry, _):
            keys, sf, si = carry
            keys, noise = noise_fn(keys)
            sf, si, obs = kern(sf, _blank(si), noise)
            return (keys, sf, si), ()
        return jax.lax.scan(body, (keys, sf, si), None, length=500)[0]

    keys, sf, si = scan_steps(eng.keys, eng.sf, eng.si)
    fetch(sf)
    scan_reps = 4

    def run_scan():
        nonlocal keys, sf, si
        t0 = time.perf_counter()
        for _ in range(scan_reps):
            keys, sf, si = scan_steps(keys, sf, si)
        fetch(sf)
        return time.perf_counter() - t0

    scan_fps = scan_reps * 500 * num_worlds / _best_of(3, run_scan)

    # --- multi-step kernel: K ticks per launch, VMEM-resident state,
    # on-chip PRNG.  Headline variant computes + stores obs every tick
    # and zeroes the trainee's actions every tick (the scripts/run.py
    # per-step workload); the held-obs variant (obs on final tick only)
    # is stderr-only.
    multistep_fps = 0.0
    multistep_held_fps = 0.0
    if on_tpu:
        K = 5000
        seed0 = jnp.zeros((1,), jnp.int32)
        ms_reps = 3

        def time_multistep(ms):
            msf, msi, _ = ms(seed0, eng.sf, eng.si)
            fetch(msf)
            state = {"sf": msf, "si": msi}

            def run():
                t0 = time.perf_counter()
                for r in range(ms_reps):
                    state["sf"], state["si"], _ = ms(
                        seed0 + r + 1, state["sf"], state["si"])
                fetch(state["sf"])
                return time.perf_counter() - t0

            return ms_reps * K * num_worlds / _best_of(3, run)

        multistep_fps = time_multistep(jax.jit(make_fused_multistep(
            cfg, num_worlds, K, obs_every_tick=True, blank_agent=0)))
        multistep_held_fps = time_multistep(jax.jit(make_fused_multistep(
            cfg, num_worlds, K)))

    print(f"[bench] device={jax.devices()[0].device_kind} "
          f"worlds={num_worlds} structured_fps={structured_fps:,.0f} "
          f"fused_dispatch_fps={fused_fps:,.0f} "
          f"fused_scan_fps={scan_fps:,.0f} "
          f"fused_multistep_fps={multistep_fps:,.0f} "
          f"fused_multistep_heldobs_fps={multistep_held_fps:,.0f}",
          file=sys.stderr)

    # Variance policy: every engine above is best-of-3 chained-launch
    # rounds, and the headline is the fastest engine's best round.  The
    # tunnel adds 2-30 ms of per-dispatch wall jitter, so point captures
    # of this metric scatter; observed cross-round spread at 8192 worlds
    # is 0.94-1.02 B steps/s (BENCH_r01-r04).  The stderr line above
    # records every engine's number for the same run.
    print("[bench] policy: best-of-3 chained rounds per engine; "
          "observed 8192-world spread across captures 0.94-1.02B",
          file=sys.stderr)
    value = max(structured_fps, fused_fps, scan_fps, multistep_fps)
    print(json.dumps({
        "metric": f"env_steps_per_sec_{num_worlds}",
        "value": round(value, 1),
        "unit": "steps/s",
        "vs_baseline": None,
        "method": "best_of_3_chained",
        "observed_spread_8192": [0.94e9, 1.02e9],
    }))


if __name__ == "__main__":
    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    main(worlds)
