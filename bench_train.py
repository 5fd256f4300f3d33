"""Training-iteration benchmark: ms/iteration and train env-steps/s.

Usage: python bench_train.py [kernel|scan] [num_envs] [--no-frozen]
                             [--fused-gae] [--bf16-traj]   (kernel mode)

Times the full PPO iteration (rollout + GAE + 4x4 minibatch update) for
the fused trainer, with the rollout either as the policy-in-the-loop
Pallas kernel (ops/fused_rollout.py) or the scan-of-launches path.
Timing follows the axon-tunnel rules (chained launches, scalar-fetch
sync, best of 3) — see BENCHMARKS.md.
"""

import sys
import time

import jax
import jax.numpy as jnp  # noqa: F401


def main():
    from madrona_basketball_tpu.utils.benching import fetch_sync
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state, make_train_iteration_fused)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_kernel = (args[0] == "kernel") if args else True
    W = int(args[1]) if len(args) > 1 else 8192
    use_frozen = "--no-frozen" not in sys.argv
    # --fused-gae measures the CLI's production default (GAE + stats +
    # side assembly as one Pallas pass); without it this times the
    # historical default path for comparability with rounds 2-3.
    fused_gae = "--fused-gae" in sys.argv
    bf16_traj = "--bf16-traj" in sys.argv
    if bf16_traj and not fused_gae:
        sys.exit("--bf16-traj requires --fused-gae (the bf16 trajectory "
                 "layout is only understood by the fused-GAE consumers)")
    if fused_gae and not use_kernel:
        sys.exit("--fused-gae requires the rollout kernel "
                 "(it consumes the kernel's trajectory layout); "
                 "use 'kernel' mode")

    cfg = SimConfig()
    hp = PPOParams(num_envs=W, use_frozen=use_frozen)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
    ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                    rollout_kernel=use_kernel,
                                    fused_gae=fused_gae,
                                    bf16_traj=bf16_traj)
    t0 = time.perf_counter()
    ts, m = ti(ts)
    fetch_sync(ts.sf)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s  "
          f"mean_reward={float(m['mean_reward']):.3f}")

    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            ts, m = ti(ts)
        fetch_sync(ts.sf)
        samples.append((time.perf_counter() - t0) / 20)
    best = min(samples)
    print(f"mode={'kernel' if use_kernel else 'scan'}"
          f"{'+gae' if fused_gae else ''}"
          f"{'+bf16' if bf16_traj else ''} W={W} "
          f"frozen={use_frozen} iter={best * 1e3:.2f} ms  "
          f"train_steps/s={W * hp.num_rollout_steps / best / 1e6:.1f}M  "
          f"samples_ms={[round(s * 1e3, 2) for s in samples]}")
    print("metrics:", {k: round(float(v), 4) for k, v in m.items()})


if __name__ == "__main__":
    main()
