"""PPO training CLI — `python -m madrona_basketball_tpu.cli [...]`.

The counterpart of `python3 scripts/ppo.py` (scripts/ppo.py:24-57, 220-371)
with the same flags and defaults (argparse instead of tyro — not in the
image).  The training loop itself runs fully on device
(ppo/train.py); this driver owns seeding, logging (console + TensorBoard),
world-0 trajectory npz recording for the viewer, and checkpointing.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from . import constants as C
from .config import SimConfig
from .models.agent import init_agent
from .ppo.hparams import PPOParams
from .ppo.train import init_train_state, make_train_iteration
from .utils.checkpoint import checkpoint_path, load_agent, save_agent
from .utils.timers import PPOTimer


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native PPO trainer")
    p.add_argument("--seed", type=int, default=321)
    p.add_argument("--model-name", type=str, default="Model")
    p.add_argument("--trainee-idx", type=int, default=1)
    p.add_argument("--trainee-checkpoint", type=str, default=None)
    p.add_argument("--frozen-checkpoint", type=str, default=None)
    p.add_argument("--num-iterations", type=int, default=100_000)
    p.add_argument("--num-envs", type=int, default=8192)
    p.add_argument("--num-rollout-steps", type=int, default=32)
    p.add_argument("--learning-rate", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.998)
    p.add_argument("--gae-lambda", type=float, default=0.95)
    p.add_argument("--num-minibatches", type=int, default=4)
    p.add_argument("--update-epochs", type=int, default=4)
    p.add_argument("--clip-coef", type=float, default=0.2)
    p.add_argument("--ent-coef", type=float, default=0.01)
    p.add_argument("--vf-coef", type=float, default=1.0)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--log-every-n-iterations", type=int, default=100)
    p.add_argument("--save-model-every-n-iterations", type=int, default=100)
    p.add_argument("--viewer", action="store_true", default=False,
                   help="record world-0 episode npz logs for the viewer")
    p.add_argument("--no-tag-mode", action="store_true", default=False)
    p.add_argument("--full-game", action="store_true", default=False)
    p.add_argument("--tensorboard", action="store_true", default=False)
    p.add_argument("--backend", choices=("fused", "structured", "xla-rows"),
                   default="fused",
                   help="fused = single-Pallas-kernel sim (TPU fast path); "
                        "structured = jit(vmap) pytree engine; "
                        "xla-rows = row layout without the Pallas kernel")
    p.add_argument("--interactive", action="store_true", default=False,
                   help="train through the live embedded viewer: host-loop "
                        "rollout with per-step controller consultation — "
                        "press H to take over world 0's selected agent, "
                        "Ctrl+P to pause the sim (the reference "
                        "scripts/ppo.py interactive behavior)")
    p.add_argument("--rollout-kernel", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="run the whole T-step rollout (policy forward + "
                        "sampling + sim) as ONE VMEM-resident Pallas "
                        "kernel.  Default: ON for the fused backend on "
                        "TPU unless --viewer needs per-step world-0 "
                        "telemetry; --no-rollout-kernel forces the "
                        "scan-of-launches rollout")
    p.add_argument("--fused-grads", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="rollout-kernel trainer only: run the whole "
                        "update phase (epochs x shuffled minibatches of "
                        "gradient + clip + Adam) as ONE scalar-prefetch "
                        "Pallas launch reading permuted blocks straight "
                        "from the trajectory buffer; --no-fused-grads "
                        "restores the materialized-gather autodiff "
                        "update (PPOParams.shuffle_block granularity)")
    p.add_argument("--fused-gae", action=argparse.BooleanOptionalAction,
                   default=None,
                   help="rollout-kernel trainer only: run GAE + "
                        "side-array assembly as one Pallas pass and "
                        "normalize inside the update kernel "
                        "(ops/fused_gae.py); requires --fused-grads. "
                        "Default: ON whenever the rollout-kernel + "
                        "fused-grads path is active (measured 16-21%% "
                        "faster at every world count, BENCHMARKS.md "
                        "round 4); --no-fused-gae restores the XLA "
                        "GAE segment")
    p.add_argument("--data-parallel", action="store_true", default=False,
                   help="shard worlds over ALL attached devices (data "
                        "mesh axis); learner replicates and gradient "
                        "sync rides ICI")
    p.add_argument("--dp-update", action="store_true", default=False,
                   help="with --data-parallel + the fused-GAE flagship "
                        "path: shard the GAE + update phase too (the "
                        "trajectory never leaves its shard; the ~21 KB "
                        "packed gradient psums per minibatch and "
                        "clip+Adam replicates) — the psum-synced "
                        "learner of BASELINE config 5.  Without it the "
                        "update replicates over a gathered trajectory "
                        "(fine to ~4 chips at 8192 envs; see "
                        "BENCHMARKS.md round 5 scaling model)")
    p.add_argument("--distributed", action="store_true", default=False,
                   help="call jax.distributed.initialize() first (run "
                        "the same command on every host of a pod slice)")
    p.add_argument("--shuffle-block", type=int,
                   default=PPOParams.shuffle_block,
                   help="epoch shuffles permute blocks of N consecutive "
                        "samples (TPU gathers are row-bound); 1 = the "
                        "reference's exact sample-granularity shuffle")
    p.add_argument("--rollout-tiled", action="store_true", default=False,
                   help="rollout-kernel trainer only: use the fully-"
                        "tiled kernel variant (whole tick on (8, blk/8) "
                        "field tiles, policy as rank-3 dot_generals, "
                        "zero relayout — measured slower than the 1-D "
                        "default, kept for A/B; docs/"
                        "rollout_kernel_tiling.md); needs the per-device "
                        "world count divisible by 1024")
    p.add_argument("--bf16-traj", action="store_true", default=False,
                   help="flagship trainer only (rollout kernel + fused "
                        "grads + fused GAE): store the rollout "
                        "trajectory in bfloat16 (kernel math stays "
                        "f32), halving the update phase's dominant HBM "
                        "re-read traffic; exactness vs the f32 chain "
                        "on the same rounded values is pinned by "
                        "tests/test_bf16_traj.py, convergence by the "
                        "round-5 same-seed A/B (BENCHMARKS.md)")
    p.add_argument("--bf16-policy", action="store_true", default=False,
                   help="rollout-kernel trainer only: bf16 operands for "
                        "the in-kernel policy matmuls (f32 accumulation "
                        "— the MXU's native input width).  Numerics "
                        "deviation gated on the round-5 convergence A/B "
                        "(BENCHMARKS.md)")
    p.add_argument("--rollout-block", type=int, default=0,
                   help="rollout-kernel trainer only: worlds per kernel "
                        "block (0 = the VMEM-safe 1024 default; larger "
                        "values trade VMEM for fewer grid steps — see "
                        "bench_rollout_blk.py for the measured sweep)")
    p.add_argument("--iters-per-dispatch", type=int, default=0,
                   help="fuse N training iterations into one device "
                        "dispatch (lax.scan) to amortize host round-trip "
                        "latency; 0 = auto (largest divisor of the "
                        "log/save cadences <= 50), 1 = one dispatch per "
                        "iteration")
    return p


class EpisodeRecorder:
    """Host-side assembly of world-0 per-step logs into episode npz files —
    the file-drop IPC the live viewer watches (scripts/ppo.py:93-122,
    scripts/viewer.py:1475-1510)."""

    def __init__(self, log_folder: str, hoop_pos: np.ndarray,
                 every_n: int = 100):
        self.log_folder = log_folder
        self.hoop_pos = hoop_pos
        self.every_n = every_n
        self.waiting = False
        self.recording = False
        self.steps: list[dict] = []
        os.makedirs(log_folder, exist_ok=True)

    def maybe_arm(self, iteration: int):
        if iteration % self.every_n == 0:
            self.waiting = True

    def feed(self, w0: dict, iteration: int):
        """w0: dict of (T, 1, ...) arrays for one rollout."""
        if not (self.waiting or self.recording):
            return
        T = w0["done"].shape[0]
        for t in range(T):
            done = float(w0["done"][t, 0]) > 0.5
            if self.recording:
                self.steps.append({k: np.asarray(v[t]) for k, v in w0.items()})
                if done:
                    self._save(iteration)
                    self.recording = False
                    return
            elif self.waiting and done:
                self.waiting = False
                self.recording = True
                self.steps = []

    def _save(self, iteration: int):
        if not self.steps:
            return
        out = {k: np.stack([s[k] for s in self.steps])
               for k in self.steps[0]}
        out["hoop_pos"] = self.hoop_pos
        path = os.path.join(self.log_folder,
                            f"iter_{iteration}_episode.npz")
        np.savez_compressed(path, **out)
        print(f"Episode trajectory saved to {path}")
        self.steps = []


def _spawn_viewer(log_folder: str):
    """Launch the live-log watcher viewer as a subprocess
    (scripts/ppo.py:261-276).  Skipped on headless hosts (no display and
    no SDL video driver override) — the recorder still drops npz logs a
    later `python -m madrona_basketball_tpu.viewer` can replay."""
    import subprocess
    import sys as _sys
    if not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")
            or os.environ.get("SDL_VIDEODRIVER")):
        print("Headless host (no DISPLAY): not spawning the live viewer; "
              f"npz drops still land in {log_folder}")
        return None
    os.makedirs(log_folder, exist_ok=True)
    print("Setting up viewer process...")
    command = [_sys.executable, "-m", "madrona_basketball_tpu.viewer",
               "--live-log-folder", log_folder]
    try:
        proc = subprocess.Popen(command)
        print(f"Viewer process started with PID: {proc.pid}")
        print(f"Viewer is now watching: {log_folder}")
        return proc
    except Exception as e:
        print(f"Failed to start viewer process: {e}")
        return None


def _teardown_viewer(proc) -> None:
    """Terminate the spawned viewer on trainer exit
    (scripts/ppo.py:352-368)."""
    import subprocess
    if proc is None:
        return
    print(f"Terminating viewer process (PID: {proc.pid})...")
    if proc.poll() is None:
        proc.terminate()
        try:
            proc.wait(timeout=5)
            print("Viewer process terminated successfully")
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            print("Viewer process killed")
    else:
        print(f"Viewer process already exited with code: {proc.returncode}")


def _run_interactive(args, cfg, hp, net, agent, frozen, model_name, key):
    """Interactive training session: embedded live viewer + human override
    (scripts/ppo.py:257-276 wiring; ppo/train_interactive.py loop)."""
    from .ppo.train_interactive import InteractiveTrainer
    from .viewer.app import ViewerClass

    viewer = ViewerClass(training_mode=True)
    timer = PPOTimer()
    trainer = InteractiveTrainer(cfg, hp, net, key, agent=agent,
                                 frozen=frozen, viewer=viewer,
                                 seed=args.seed, timer=timer)
    viewer.env = trainer.env
    print("Interactive training: H = human control of selected agent "
          "(click to select), Ctrl+P = pause, 1-0 = world switch")
    for iteration in range(1, args.num_iterations + 1):
        timer.start("iter")
        timer.add_steps(hp.num_envs * hp.num_rollout_steps)
        metrics = trainer.train_iteration()
        timer.end("iter")
        if iteration % args.log_every_n_iterations == 0:
            m = {k: float(v) for k, v in metrics.items()}
            print(f"\nUpdate: {iteration}", end=" ")
            timer.print()
            print(f"Mean reward: {m['mean_reward']:.2f}. "
                  f"Mean episode length: {m['mean_episode_length']:.2f}")
            timer.reset()
        if iteration % args.save_model_every_n_iterations == 0:
            path = checkpoint_path(model_name, iteration)
            save_agent(trainer.agent, path)
            print(f"Model {model_name} saved at iteration {iteration}")
    return trainer


def main(argv=None):
    args = build_parser().parse_args(argv)
    from .utils.profiling import enable_compile_cache, honor_platform_env
    honor_platform_env()
    enable_compile_cache()
    if args.distributed:
        from .parallel.distributed import init_distributed
        n = init_distributed()
    # Multi-host: only process 0 owns host-side I/O (checkpoints on a
    # shared filesystem, console logs, TensorBoard, viewer recordings) —
    # every process would otherwise clobber the same paths.
    is_main = jax.process_index() == 0
    if args.distributed and is_main:
        print(f"jax.distributed: {jax.process_count()} process(es), "
              f"{n} global device(s)")
    model_name = args.model_name or \
        f"MadronaBasketball__{args.seed}__{int(time.time())}"

    cfg = SimConfig(one_on_one=not args.full_game,
                    tag_mode=not args.no_tag_mode and not args.full_game)
    hp = PPOParams(
        num_envs=args.num_envs,
        num_rollout_steps=args.num_rollout_steps,
        learning_rate=args.learning_rate,
        gamma=args.gamma, gae_lambda=args.gae_lambda,
        num_minibatches=args.num_minibatches,
        update_epochs=args.update_epochs,
        clip_coef=args.clip_coef, ent_coef=args.ent_coef,
        vf_coef=args.vf_coef, max_grad_norm=args.max_grad_norm,
        trainee_idx=args.trainee_idx,
        use_frozen=args.frozen_checkpoint is not None,
        # Uniform across processes: the jitted program must be identical
        # on every host under --distributed (SPMD); only the host-side
        # recorder below is gated on is_main.
        record_world0=args.viewer,
        shuffle_block=args.shuffle_block,
    )

    key = jax.random.PRNGKey(args.seed)
    net, template = init_agent(jax.random.PRNGKey(0))
    agent = load_agent(args.trainee_checkpoint, template) \
        if args.trainee_checkpoint else None
    frozen = load_agent(args.frozen_checkpoint, template) \
        if args.frozen_checkpoint else None

    if is_main:
        print("🎯 TRAINING CONFIGURATION:")
        print(f"   Trainee Agent Index: {hp.trainee_idx}")
        print(f"   Frozen Checkpoint: {args.frozen_checkpoint}")
        print(f"   Model: {model_name}  Envs: {hp.num_envs}  "
              f"Iters: {args.num_iterations}")
        print(f"   Devices: {jax.devices()}")

    if args.interactive:
        return _run_interactive(args, cfg, hp, net, agent, frozen,
                                model_name, key)

    import jax as _jax
    backend = args.backend
    if backend == "fused" and _jax.devices()[0].platform != "tpu":
        backend = "xla-rows"  # Mosaic kernels are TPU-only

    mesh = None
    if args.data_parallel:
        from .parallel.mesh import make_mesh
        mesh = make_mesh()
        if hp.num_envs % mesh.size:
            raise SystemExit(f"--num-envs {hp.num_envs} must divide evenly "
                             f"over {mesh.size} devices")
        if is_main:
            print(f"Data-parallel over {mesh.size} devices "
                  f"({hp.num_envs // mesh.size} worlds each)")

    if backend == "structured":
        ts = init_train_state(cfg, hp, net, key, agent=agent, frozen=frozen)
        train_iteration = make_train_iteration(cfg, hp, net)
        if mesh is not None:
            from .parallel.mesh import shard_train_state
            ts = shard_train_state(ts, mesh)
    else:
        from .ppo.train_fused import (init_fused_train_state,
                                      make_train_iteration_fused)
        ts = init_fused_train_state(cfg, hp, net, key, agent=agent,
                                    frozen=frozen)
        rollout_kernel = args.rollout_kernel
        if rollout_kernel is None:
            rollout_kernel = backend == "fused" and not args.viewer
        if args.fused_gae is None:
            # default ON for the flagship path (BENCHMARKS.md round 4:
            # 3.63 vs 4.33 ms/iter @ 8192, 18.43 vs 23.21 @ 65536);
            # the tiled rollout variant has no in-kernel obs moments
            # but composes with the separate moments kernel, so the
            # default still applies.
            args.fused_gae = rollout_kernel and args.fused_grads
        if args.fused_gae and not (rollout_kernel and args.fused_grads):
            raise SystemExit(
                "--fused-gae requires the rollout kernel and fused "
                "gradients (drop --no-rollout-kernel/--no-fused-grads/"
                "--viewer, or drop --fused-gae)")
        if args.dp_update and (mesh is None or not args.fused_gae):
            raise SystemExit(
                "--dp-update requires --data-parallel and the fused-GAE "
                "flagship path")
        train_iteration = make_train_iteration_fused(
            cfg, hp, net,
            backend="pallas" if backend == "fused" else "xla",
            mesh=mesh, rollout_kernel=rollout_kernel,
            fused_grads=args.fused_grads,
            fused_gae=args.fused_gae,
            rollout_block=args.rollout_block or None,
            rollout_tiled=args.rollout_tiled,
            bf16_traj=args.bf16_traj,
            bf16_policy=args.bf16_policy,
            dp_update=args.dp_update)
        if mesh is not None:
            from .parallel.mesh import shard_fused_train_state
            ts = shard_fused_train_state(ts, mesh)

    writer = None
    if args.tensorboard and is_main:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(f"runs/{model_name}")

    recorder = None
    viewer_process = None
    if args.viewer and is_main:
        from .ops.fused_step import _hoop_geometry
        (h0x, h0y), (h1x, h1y) = _hoop_geometry(cfg)
        hoop_pos = np.array([[[h0x, h0y, 0.0], [h1x, h1y, 0.0]]], np.float32)
        recorder = EpisodeRecorder(f"logs/{model_name}", hoop_pos,
                                   every_n=args.log_every_n_iterations)
        # scripts/ppo.py:261-276: --viewer also SPAWNS the watcher viewer
        # so one command gives the train-and-watch loop.
        viewer_process = _spawn_viewer(f"logs/{model_name}")
        if viewer_process is not None:
            # Teardown must survive exceptions / Ctrl-C in the training
            # loop, not just the clean exit path (idempotent: poll()).
            import atexit
            atexit.register(_teardown_viewer, viewer_process)

    from .ppo.train import auto_chunk
    chunk_n = args.iters_per_dispatch or auto_chunk(
        args.log_every_n_iterations, args.save_model_every_n_iterations)
    if chunk_n > 1 and (args.log_every_n_iterations % chunk_n or
                        args.save_model_every_n_iterations % chunk_n):
        # A chunk that straddles a save/log boundary would checkpoint
        # end-of-chunk params under a mid-chunk iteration label.
        safe = auto_chunk(args.log_every_n_iterations,
                          args.save_model_every_n_iterations)
        print(f"--iters-per-dispatch {chunk_n} does not divide the "
              f"log/save cadence; using {safe} instead")
        chunk_n = safe
    chunk_n = max(1, min(chunk_n, args.num_iterations))
    if chunk_n > 1:
        from .ppo.train import make_train_chunk, unstack_metrics
        train_chunk = make_train_chunk(train_iteration, chunk_n)

        def run_block(ts):
            ts, stacked = train_chunk(ts)
            return ts, unstack_metrics(stacked, chunk_n)
    else:
        def run_block(ts):
            ts, m = train_iteration(ts)
            return ts, [m]

    timer = PPOTimer()
    iteration = 0
    while iteration < args.num_iterations:
        remaining = args.num_iterations - iteration
        timer.start("iter")
        if remaining >= chunk_n:
            timer.add_steps(hp.num_envs * hp.num_rollout_steps * chunk_n)
            ts, metric_list = run_block(ts)
        else:
            # exact tail: run the leftover iterations one dispatch each
            timer.add_steps(hp.num_envs * hp.num_rollout_steps * remaining)
            metric_list = []
            for _ in range(remaining):
                ts, m = train_iteration(ts)
                metric_list.append(m)
        for metrics in metric_list:
            iteration += 1
            if recorder is not None:
                recorder.maybe_arm(iteration)
                w0 = jax.device_get(metrics.pop("world0"))
                recorder.feed(w0, iteration)
            elif "world0" in metrics:
                metrics.pop("world0")
            if iteration % args.log_every_n_iterations == 0:
                jax.block_until_ready(ts.agent.params)
                timer.end("iter")
                m = {k: float(v) for k, v in metrics.items()}
                if is_main:
                    print(f"\nUpdate: {iteration}", end=" ")
                    timer.print()
                    print(f"Mean reward: {m['mean_reward']:.2f}. "
                          f"Mean episode length: "
                          f"{m['mean_episode_length']:.2f}")
                if writer is not None:
                    for k, v in m.items():
                        writer.add_scalar(k, v, iteration)
                timer.reset()
                timer.start("iter")

            if iteration % args.save_model_every_n_iterations == 0 \
                    and is_main:
                path = checkpoint_path(model_name, iteration)
                save_agent(ts.agent, path)
                print(f"Model {model_name} saved at iteration {iteration}")
        timer.end("iter")

    if viewer_process is not None:
        # Clean exit: tear down once, deterministically, and drop the
        # crash-path atexit hook so it doesn't run a second time.
        import atexit
        atexit.unregister(_teardown_viewer)
        _teardown_viewer(viewer_process)
    if writer is not None:
        writer.close()
    return ts


if __name__ == "__main__":
    main()
