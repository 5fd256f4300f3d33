"""True multi-process jax.distributed validation (SURVEY §4).

Two OS processes x 4 virtual CPU devices each join one jax.distributed
cluster (coordinator handshake through parallel.distributed
.init_distributed — the CLI's --distributed path), build the global
8-device mesh, and run two fused train iterations with the world axis
sharded ACROSS processes.  The resulting parameters must match the
same program run single-process on 8 virtual devices — proving the
multi-host SPMD path (mesh construction, cross-process collectives for
the gradient all-reduce, replicated-learner invariants) end to end."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np

from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.models.agent import init_agent
from madrona_basketball_tpu.parallel.mesh import (make_mesh,
                                                  shard_fused_train_state)
from madrona_basketball_tpu.ppo import train_fused as TF
from madrona_basketball_tpu.ppo.hparams import PPOParams


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(tmp_path, mode: str):
    port = _free_port()
    out = tmp_path / "mp_params.npz"
    worker = os.path.join(os.path.dirname(__file__), "mp_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), str(out), mode],
        cwd="/root/repo", env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=840)
        logs.append(stdout.decode(errors="replace"))
    for pid, (p, log) in enumerate(zip(procs, logs)):
        if p.returncode != 0:
            # Teardown-only flake under heavy host load: the
            # coordination-service SHUTDOWN barrier can time out after
            # all computation (and the result write) completed.  The
            # test validates the training math, not clean teardown of a
            # throwaway 2-process cluster — tolerate iff the failure is
            # specifically the shutdown barrier and the payload exists.
            teardown_only = ("Shutdown" in log and "barrier" in log.lower()
                             and out.exists())
            assert teardown_only, f"worker {pid} failed:\n{log[-4000:]}"
            print(f"worker {pid}: tolerated shutdown-barrier teardown "
                  "flake (results were already written)")
    assert out.exists(), "process 0 wrote no parameters"
    got = np.load(out)

    # Single-process reference: identical program on the 8-device mesh.
    cfg = SimConfig()
    hp = PPOParams(num_envs=16, num_rollout_steps=4, num_minibatches=2,
                   update_epochs=1)
    net, _ = init_agent(jax.random.PRNGKey(0))
    ts = TF.init_fused_train_state(cfg, hp, net, jax.random.PRNGKey(3))
    mesh = make_mesh()
    ts = shard_fused_train_state(ts, mesh)
    kernel_mode = mode == "rollout_kernel"
    it = TF.make_train_iteration_fused(cfg, hp, net, backend="xla",
                                       mesh=mesh,
                                       rollout_kernel=kernel_mode,
                                       rollout_interpret=kernel_mode)
    ts, _ = it(ts)
    ts, m = it(ts)

    leaves = jax.tree.leaves(ts.agent.params)
    assert len(leaves) == len([k for k in got.files if k.startswith("p")])
    for i, leaf in enumerate(leaves):
        np.testing.assert_allclose(got[f"p{i}"], np.asarray(leaf),
                                   atol=2e-5,
                                   err_msg=f"param leaf {i} diverged")
    np.testing.assert_allclose(float(got["adv_abs_mean"]),
                               float(m["adv_abs_mean"]), atol=1e-4)


def test_two_process_distributed_train_matches_single(tmp_path):
    _run_two_process(tmp_path, "xla")


def test_two_process_rollout_kernel_matches_single(tmp_path):
    """The FLAGSHIP trainer (policy-in-the-loop rollout kernel +
    scalar-prefetch fused gradients) across real process boundaries:
    parameters must match the same program run single-process."""
    _run_two_process(tmp_path, "rollout_kernel")
