"""Convergence run of the flagship trainer (rollout kernel +
scalar-prefetch fused gradients) — the learning-curve evidence for the
round-3 update-block shuffle granularity and the composable PRNG stream
(BENCHMARKS.md).  Chunks 100 iterations per dispatch to amortize tunnel
latency.

Usage: python run_convergence.py [envs] [iters] [seed] [update_block]
           [--no-fused-grads]

--no-fused-grads switches the update to the materialized-gather path
(run_epochs, shuffle_block=8 super-rows) — the round-2 recipe — for
A/B-ing the shuffle-granularity deviation with everything else equal.
"""

import sys

import jax

from run_round3_tpu import run_chunked


def main():
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train import make_train_chunk
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state, make_train_iteration_fused)

    fused_grads = "--no-fused-grads" not in sys.argv
    # Default is the canonical learning task (defender trainee, no frozen
    # opponent — in-sim hardCodeDefense drives the offense, the reference's
    # shape when training without a frozen checkpoint); --frozen switches
    # to the frozen-opponent self-play shape.
    use_frozen = "--frozen" in sys.argv
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.argv = [sys.argv[0]] + argv
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    ub = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    cfg = SimConfig()
    hp = PPOParams(num_envs=W, use_frozen=use_frozen, update_block=ub)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(seed))
    ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                    rollout_kernel=True,
                                    fused_grads=fused_grads)
    CH = 100
    chunk = make_train_chunk(ti, CH)
    label = (f"conv seed={seed} "
             f"ub={(ub or 'auto') if fused_grads else 'OFF'}")
    run_chunked(ts, chunk, iters, label, W, hp.num_rollout_steps, CH)


if __name__ == "__main__":
    main()
