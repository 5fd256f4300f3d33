"""Rollout-kernel time attribution (round-5 verdict item 2).

The production rollout kernel runs at ~0.948 ms / iteration at 8192x32
— 4.9x its HBM floor (BENCHMARKS.md round 4) — and until now that time
was unattributed below the whole-kernel level.  This bench builds
TIMING-ONLY probe variants of the kernel (ops/fused_rollout.py
`probe=`) that each remove one cost term, so the differences against
the full kernel attribute the time:

    full            the production kernel (baseline)
    sim_only        - policy forward x2, Gumbel-max sampling
    policy_only     - the whole 19-system sim tick
    no_traj         - the per-tick trajectory HBM write stream
    no_prng         - the on-chip PRNG draws (46 rows/tick)
    bf16_mm         full, but policy matmuls take bf16 operands (the
                    attack candidate: MXU-native input width)
    bf16_traj       full, trajectory stored bf16 (write-side half of
                    the --bf16-traj lever)

plus a T-sweep of the full kernel (per-launch overhead vs per-tick
cost).  Probes break training semantics by construction — they exist
only here and in the preflight stage.

Run on the real TPU from the repo root:
    python bench_rollout_attr.py [W] [--quick]
(--quick skips the T-sweep.)
"""

import sys

import jax
import jax.numpy as jnp

from madrona_basketball_tpu.utils.benching import bench_ms as bench


def main(W: int = 8192, quick: bool = False):
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ops import fused_rollout as FR
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train_fused import \
        init_fused_train_state

    T = 32
    cfg = SimConfig()
    hp = PPOParams(num_envs=W, use_frozen=True)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
    mats = FR.pack_policy(ts.agent) + FR.pack_policy(ts.frozen)
    rng = jnp.zeros((1, 2), jnp.int32).at[0, 0].set(7)

    def time_variant(label, **kw):
        try:
            rk = FR.make_fused_rollout(cfg, W, T, trainee_idx=1,
                                       use_frozen=True, block=1024, **kw)

            @jax.jit
            def run(sf, si, obs, _rk=rk):
                return _rk(rng, sf, si, obs, *mats)

            ms = bench(run, (ts.sf, ts.si, ts.obs))
            print(f"[attr] {label:12s} {ms:7.3f} ms  "
                  f"({W * T / ms / 1e3:.0f}M env-steps/s)", flush=True)
            return ms
        except Exception as e:  # noqa: BLE001 — a probe that fails to
            # lower is a result too; keep the log one line
            print(f"[attr] {label:12s} FAILED "
                  f"{type(e).__name__}: {str(e).splitlines()[0][:140]}",
                  flush=True)
            return None

    full = time_variant("full")
    sim_only = time_variant("sim_only", probe="sim_only")
    policy_only = time_variant("policy_only", probe="policy_only")
    no_traj = time_variant("no_traj", probe="no_traj")
    no_prng = time_variant("no_prng", probe="no_prng")
    bf16_mm = time_variant("bf16_mm", policy_bf16=True)
    bf16_tj = time_variant("bf16_traj", traj_dtype=jnp.bfloat16)

    if full:
        print(f"[attr] --- attribution at W={W}, T={T} "
              f"(deltas vs full {full:.3f} ms) ---", flush=True)
        for label, v in (("policy+sampling", sim_only),
                         ("sim tick", policy_only),
                         ("traj writes", no_traj),
                         ("prng draws", no_prng)):
            if v is not None:
                print(f"[attr]   {label:16s} ~{full - v:6.3f} ms "
                      f"({100 * (full - v) / full:.0f}%)", flush=True)
        for label, v in (("bf16 matmuls", bf16_mm),
                         ("bf16 traj store", bf16_tj)):
            if v is not None:
                print(f"[attr]   {label:16s} saves {full - v:6.3f} ms "
                      f"-> {v:.3f} ms", flush=True)

    if not quick:
        print("[attr] --- T-sweep (full kernel) ---", flush=True)
        pts = []
        for t_len in (1, 4, 16, 32):
            rk = FR.make_fused_rollout(cfg, W, t_len, trainee_idx=1,
                                       use_frozen=True, block=1024)

            @jax.jit
            def run(sf, si, obs, _rk=rk):
                return _rk(rng, sf, si, obs, *mats)

            ms = bench(run, (ts.sf, ts.si, ts.obs))
            pts.append((t_len, ms))
            print(f"[attr] T={t_len:2d}  {ms:7.3f} ms  "
                  f"({ms / t_len * 1e3:.0f} us/tick)", flush=True)
        if len(pts) >= 2:
            (t0, m0), (t1, m1) = pts[0], pts[-1]
            per_tick = (m1 - m0) / (t1 - t0)
            print(f"[attr] per-tick {per_tick * 1e3:.1f} us, per-launch "
                  f"{m0 - per_tick * t0:.3f} ms", flush=True)


if __name__ == "__main__":
    _pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(W=int(_pos[0]) if _pos else 8192,
         quick="--quick" in sys.argv)
