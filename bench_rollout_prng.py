"""On-TPU equivalence pin for the rollout kernel's ON-CHIP PRNG branch.

The interpret-mode tests prove kernel == XLA rollout on INJECTED noise
(tests/test_rollout_kernel.py), but production training runs the
`external_noise=False` branch (ops/fused_rollout.py), whose Mosaic PRNG
has no CPU lowering.  This script pins that branch on the real chip by
the same composition method used for the multi-step sim kernel
(BENCHMARKS.md round 1): the PRNG stream is seeded per (block, tick) as
`seed, block * TICK_STRIDE + tick_base + t`, so ONE T-step launch with
tick_base=0 must reproduce, bit for bit, T chained single-step launches
with tick_base = 0..T-1 — same policy forwards, same Gumbel draws, same
sim noise, same trajectory rows — while the state round-trips HBM
between the single-step launches instead of staying VMEM-resident.

Run on the real TPU (default env):  python bench_rollout_prng.py [W] [T]
Prints per-output max |delta| (expected: exact zeros).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from madrona_basketball_tpu import engine
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models import agent as agent_lib
from madrona_basketball_tpu.ops import fused_rollout as FR
from madrona_basketball_tpu.ops import layout
from madrona_basketball_tpu.ops.fused_step import make_fused_step
from madrona_basketball_tpu.engine_fused import make_noise_fn

I32 = jnp.int32


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    seed = 12345
    cfg = SimConfig()
    ti = 1
    net, agent = agent_lib.init_agent(jax.random.PRNGKey(11))
    _, frozen = agent_lib.init_agent(jax.random.PRNGKey(12))
    mats = FR.pack_policy(agent) + FR.pack_policy(frozen)

    # a settled post-reset-pulse state (the rollout contract's start)
    env = engine.init_batch(cfg, jax.random.PRNGKey(5), W)
    sf, si = layout.pack(env)
    step = make_fused_step(cfg, W, block=1024)
    noise_fn = make_noise_fn(cfg)
    keys, noise = noise_fn(env.key)
    sf, si, obs0 = jax.jit(step)(sf, si, noise)

    rk_full = FR.make_fused_rollout(cfg, W, T, trainee_idx=ti,
                                    use_frozen=True, block=1024)
    rk_one = FR.make_fused_rollout(cfg, W, 1, trainee_idx=ti,
                                   use_frozen=True, block=1024)

    @jax.jit
    def full(sf, si, obs0):
        rng = jnp.asarray([[seed, 0]], I32)
        return rk_full(rng, sf, si, obs0, *mats)

    @jax.jit
    def composed(sf, si, obs0):
        def body(carry, t):
            sf, si, obs = carry
            rng = jnp.stack([jnp.full((1,), seed, I32),
                             t[None].astype(I32)], axis=1)
            sf, si, obs, traj1 = rk_one(rng, sf, si, obs, *mats)
            return (sf, si, obs), traj1[0]

        (sf, si, obs), traj = jax.lax.scan(body, (sf, si, obs0),
                                           jnp.arange(T))
        return sf, si, obs, traj

    print(f"[prng-pin] W={W} T={T}: compiling + running the T-step "
          "launch ...", flush=True)
    sf_f, si_f, obs_f, traj_f = jax.block_until_ready(full(sf, si, obs0))
    print("[prng-pin] compiling + running the chained 1-step launches "
          "...", flush=True)
    sf_c, si_c, obs_c, traj_c = jax.block_until_ready(
        composed(sf, si, obs0))

    def dmax(a, b):
        return float(np.max(np.abs(np.asarray(jax.device_get(a), np.float64)
                                   - np.asarray(jax.device_get(b),
                                                np.float64))))

    deltas = {
        "traj": dmax(traj_f, traj_c),
        "sf": dmax(sf_f, sf_c),
        "si": dmax(si_f, si_c),
        "obs": dmax(obs_f, obs_c),
    }
    acts_equal = bool(np.array_equal(
        np.asarray(jax.device_get(traj_f[:, FR.R_ACT:FR.R_ACT + 6])),
        np.asarray(jax.device_get(traj_c[:, FR.R_ACT:FR.R_ACT + 6]))))
    print(f"[prng-pin] max|delta| {deltas} actions_equal={acts_equal}")
    ok = all(v == 0.0 for v in deltas.values()) and acts_equal
    print(f"[prng-pin] {'PASS (bit-exact)' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
