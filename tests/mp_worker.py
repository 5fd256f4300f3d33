"""Worker process for the true multi-process jax.distributed test.

Launched by tests/test_multiprocess.py (2 processes x 4 virtual CPU
devices).  Each process joins the cluster through
parallel.distributed.init_distributed (the exact code path the CLI's
--distributed flag uses), builds the GLOBAL 8-device mesh, runs two
fused train iterations with worlds sharded across both processes, and
process 0 dumps the resulting (replicated) agent parameters.

Usage: mp_worker.py <coordinator_port> <process_id> <out.npz> [mode]

mode: "xla" (default) runs the scan-rollout trainer; "rollout_kernel"
runs the FLAGSHIP policy-in-the-loop rollout-kernel + fused-gradient
trainer (interpret mode — Mosaic has no CPU lowering) so the production
training path is validated across real process boundaries too.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    mode = sys.argv[4] if len(sys.argv) > 4 else "xla"

    from madrona_basketball_tpu.parallel.distributed import init_distributed
    n_devices = init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid)
    assert n_devices == 8, f"global devices {n_devices} != 8"
    assert jax.process_count() == 2
    # Calling again must be a clean no-op (the already-initialized path).
    assert init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2, process_id=pid) == 8

    from madrona_basketball_tpu.config import SimConfig
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.parallel.mesh import (
        make_mesh, shard_fused_train_state)
    from madrona_basketball_tpu.ppo import train_fused as TF
    from madrona_basketball_tpu.ppo.hparams import PPOParams

    cfg = SimConfig()
    hp = PPOParams(num_envs=16, num_rollout_steps=4, num_minibatches=2,
                   update_epochs=1)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(3))
    mesh = make_mesh()  # spans BOTH processes
    assert mesh.size == 8
    ts = shard_fused_train_state(ts, mesh)
    kernel_mode = mode == "rollout_kernel"
    it = TF.make_train_iteration_fused(cfg, hp, net, backend="xla",
                                       mesh=mesh,
                                       rollout_kernel=kernel_mode,
                                       rollout_interpret=kernel_mode)
    # Compile LOCALLY first, then rendezvous with a generous timeout
    # before the first execution: the Gloo collective setup allows only
    # ~30 s between the first and last process reaching it, which a
    # compile-time skew under host load can exceed (observed flake).
    compiled = it.lower(ts).compile()
    try:
        from jax._src import distributed as _dist
        _dist.global_state.client.wait_at_barrier("mbb_compiled",
                                                  timeout_in_ms=600_000)
    except Exception as e:  # private API; degrade to the old behavior
        print(f"barrier skipped: {e}")
    ts, _m = compiled(ts)
    ts, m = compiled(ts)

    if pid == 0:
        leaves = jax.tree.leaves(ts.agent.params)
        payload = {f"p{i}": np.asarray(leaf.addressable_data(0))
                   for i, leaf in enumerate(leaves)}
        payload["adv_abs_mean"] = np.asarray(
            m["adv_abs_mean"].addressable_data(0))
        np.savez(out_path, **payload)
    # Synchronize BEFORE process exit: without this, the non-writing
    # worker can reach the atexit distributed-shutdown barrier while
    # process 0 is still saving, and the barrier fails with "another
    # task died" (observed as a flake under host load).
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("mp_worker_done")


if __name__ == "__main__":
    main()
