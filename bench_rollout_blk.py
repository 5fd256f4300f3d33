"""Rollout-kernel world-block sweep (the zero-risk lever from
docs/rollout_kernel_tiling.md): larger blocks mean fewer grid steps per
launch at the cost of VMEM (~2.6 MB at blk=1024, ~11 MB at blk=4096).

For each block size this times (a) the rollout kernel alone and (b) the
full fused training iteration built with rollout_block=blk, so the win
is read in iteration milliseconds, not just kernel microseconds.

Run on the real TPU from the repo root:  python bench_rollout_blk.py [W]
"""

import re
import sys

import jax
import jax.numpy as jnp

from madrona_basketball_tpu.utils.benching import bench_ms as bench


def fail_line(e: Exception) -> str:
    """One-line failure reason instead of a multi-KB traceback in the
    evidence log.  The known case is the scoped-VMEM limit (blk=4096
    needs ~28.8M > the ~16M budget at 8192 envs); anything else keeps
    its first line."""
    msg = str(e)
    m = re.search(r"Requested (\d+) bytes.*?limit.*?of (\d+) bytes",
                  msg, re.S)
    if m and ("vmem" in msg.lower() or "VMEM" in msg):
        need, limit = (int(m.group(1)) / 2**20, int(m.group(2)) / 2**20)
        return (f"skipped: exceeds scoped VMEM "
                f"({need:.2f}M > {limit:.2f}M)")
    if "RESOURCE_EXHAUSTED" in msg or "vmem" in msg.lower():
        first = next((ln for ln in msg.splitlines()
                      if "RESOURCE_EXHAUSTED" in ln or "vmem" in ln.lower()),
                     msg.splitlines()[0] if msg else repr(e))
        return f"skipped: {first.strip()[:160]}"
    return f"FAILED {type(e).__name__}: {msg.splitlines()[0][:160]}" \
        if msg else f"FAILED {e!r}"


def main():
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ops import fused_rollout as FR
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train_fused import (
        init_fused_train_state, make_train_iteration_fused)

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    T = 32
    cfg = SimConfig()
    hp = PPOParams(num_envs=W, use_frozen=True)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(1))
    mats = FR.pack_policy(ts.agent) + FR.pack_policy(ts.frozen)
    rng = jnp.zeros((1, 2), jnp.int32).at[0, 0].set(7)

    for blk in (512, 1024, 2048, 4096):
        if blk > W:
            continue
        # ---- rollout kernel alone ----
        try:
            rk = FR.make_fused_rollout(cfg, W, T, trainee_idx=1,
                                       use_frozen=True, block=blk,
                                       max_block=blk)

            @jax.jit
            def rollout_only(sf, si, obs, _rk=rk):
                return _rk(rng, sf, si, obs, *mats)

            t_roll = bench(rollout_only, (ts.sf, ts.si, ts.obs))
            print(f"blk={blk:5d} rollout_kernel: {t_roll:7.3f} ms "
                  f"({W * T / t_roll / 1e3:.0f}M env-steps/s in-program)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — VMEM overflow is data too
            print(f"blk={blk:5d} rollout_kernel: {fail_line(e)}", flush=True)
            continue

        # ---- full iteration with this rollout block ----
        try:
            ti = make_train_iteration_fused(cfg, hp, net, backend="pallas",
                                            rollout_kernel=True,
                                            rollout_block=blk)
            t_full = bench(lambda s, _ti=ti: _ti(s)[0], (ts,))
            print(f"blk={blk:5d} full_iteration: {t_full:7.3f} ms "
                  f"({W * T / t_full / 1e3:.1f}M train steps/s)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"blk={blk:5d} full_iteration: {fail_line(e)}", flush=True)

    # ---- 2-D-tiled prototype (docs/rollout_kernel_tiling.md): first
    # hardware measurement decides whether the policy-boundary relayout
    # eats the sim-segment win — a FAILED line is a result too (Mosaic
    # lowering of the sublane-sliced relayout is untested on hardware).
    for blk in (1024, 2048):
        if blk > W:
            continue
        try:
            rk = FR.make_fused_rollout_tiled(cfg, W, T, trainee_idx=1,
                                             use_frozen=True, block=blk)

            @jax.jit
            def tiled_only(sf, si, obs, _rk=rk):
                return _rk(rng, sf, si, obs, *mats)

            t_roll = bench(tiled_only, (ts.sf, ts.si, ts.obs))
            print(f"blk={blk:5d} tiled_rollout:  {t_roll:7.3f} ms "
                  f"({W * T / t_roll / 1e3:.0f}M env-steps/s in-program)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"blk={blk:5d} tiled_rollout:  {fail_line(e)}", flush=True)


if __name__ == "__main__":
    main()
