"""Policy evaluation + trajectory logging.

Port of scripts/infer.py: roll a checkpoint (stochastic or argmax) across N
worlds until each completes `num_episodes`, logging the full trajectory to a
compressed npz with the reference's exact key schema
(scripts/infer.py:116-129) so the playback viewer consumes it unchanged;
`multi_gen_infer` evaluates every checkpoint generation of a model on a
fixed seed (scripts/infer.py:154-186).

CLI: python -m madrona_basketball_tpu.infer [...]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import numpy as np

from . import engine
from .config import SimConfig
from .env import BasketballEnv
from .export import export_tensors
from .models import agent as agent_lib
from .models.agent import AgentParams, init_agent
from .utils.checkpoint import load_agent


def make_policy_fn(net, ap: AgentParams, key: jax.Array,
                   stochastic: bool = True):
    """A stateful callable obs -> actions (one fresh subkey per call)."""
    state = {"key": key}

    @jax.jit
    def fwd(k, obs):
        actions, _, _ = agent_lib.forward(net, ap, obs, k,
                                          stochastic=stochastic)
        return actions

    def policy(obs):
        state["key"], k = jax.random.split(state["key"])
        return fwd(k, obs)

    return policy


def _make_eval_chunk(cfg: SimConfig, net, trainee_idx: int,
                     stochastic: bool, use_frozen: bool, K: int,
                     num_episodes: int):
    """Up to K policy+sim steps per device dispatch for the eval loop,
    with the per-step npz log tensors collected on device and fetched
    once per chunk — removes the per-step host round-trip of the naive
    loop (2-30 ms each through a remote-TPU tunnel).

    Episode completion is checked ON DEVICE every step (lax.while_loop
    with the per-world episode counts in carry), so the dispatch stops
    at exactly the tick the reference's per-step loop would
    (scripts/infer.py:85-113): no post-completion steps ever reach the
    sim state or the trajectory log.  Returns (state, key, counts,
    steps_run, logs) where logs rows >= steps_run are zero padding the
    caller trims."""
    ti = trainee_idx
    fi = 1 - trainee_idx
    vstep = jax.vmap(lambda w: engine.step(cfg, w))
    import jax.numpy as jnp

    @jax.jit
    def chunk(state, ap, fp, key, counts):
        def one_step(state, key):
            key, k1, k2 = jax.random.split(key, 3)
            actions, _, _ = agent_lib.forward(
                net, ap, state.agents.obs[:, ti], k1,
                stochastic=stochastic)
            acts = state.agents.action.at[:, ti].set(actions)
            if use_frozen:
                fa, _, _ = agent_lib.forward(net, fp,
                                             state.agents.obs[:, fi], k2)
                acts = acts.at[:, fi].set(fa)
            state = vstep(state.replace(
                agents=state.agents.replace(action=acts)))
            t = export_tensors(state)
            log = {"agent_pos": t["agent_pos"],
                   "ball_pos": t["basketball_pos"],
                   "ball_vel": t["ball_velocity"],
                   "orientation": t["orientation"],
                   "ball_physics": t["ball_physics"],
                   "agent_possession": t["agent_possession"],
                   "game_state": t["game_state"],
                   "rewards": t["reward"],
                   "actions": t["action"],
                   "done": state.agents.done[:, ti]}
            return state, key, log

        # shape/dtype template for the preallocated log buffers
        log_shapes = jax.eval_shape(lambda s, k: one_step(s, k)[2],
                                    state, key)
        logs0 = jax.tree_util.tree_map(
            lambda sd: jnp.zeros((K,) + sd.shape, sd.dtype), log_shapes)

        def cond(c):
            _state, _key, counts, t, _logs = c
            go = t < K
            if num_episodes > 0:
                go = go & jnp.any(counts < num_episodes)
            return go

        def body(c):
            state, key, counts, t, logs = c
            state, key, log = one_step(state, key)
            logs = jax.tree_util.tree_map(
                lambda buf, v: buf.at[t].set(v), logs, log)
            counts = counts + log["done"].astype(jnp.int32)
            return state, key, counts, t + 1, logs

        state, key, counts, t, logs = jax.lax.while_loop(
            cond, body, (state, key, counts, jnp.zeros((), jnp.int32),
                         logs0))
        return state, key, counts, t, logs

    return chunk


def infer(env: BasketballEnv, net, policy_params: AgentParams,
          log_path: str = "logs/trajectories.npz", num_episodes: int = 5,
          max_steps: int = 10000, stochastic: bool = True, seed: int = 0,
          trainee_idx: int = 1, frozen_params: AgentParams = None,
          chunk_size: int = 0):
    env.set_agent_idx(trainee_idx)
    policy = make_policy_fn(net, policy_params, jax.random.PRNGKey(seed),
                            stochastic)
    # Interactive eval: attach a controller manager so a live viewer's H
    # key hands world 0 to the keyboard (scripts/infer.py:45-48).
    from .controllers import SimpleControllerManager
    controller_manager = SimpleControllerManager(net, policy_params,
                                                 seed=seed)
    env.set_controller_manager(controller_manager)

    trajectory_log = []
    static_log = {}
    if log_path:
        Path(log_path).parent.mkdir(parents=True, exist_ok=True)
        static_log["hoop_pos"] = np.asarray(
            jax.device_get(env.state.hoops.pos))

    obs, _, _ = env.reset()
    episode_counts = np.zeros(env.num_worlds, dtype=np.int64)

    # Chunked fast path: no viewer attached -> no per-step interactivity
    # needed, so the on-device while_loop runs up to K steps per
    # dispatch and stops at the exact episode-completion tick (chunked
    # == per-step, tests/test_env.py::test_chunked_eval_matches_per_step).
    if chunk_size == 0:
        chunk_size = 1 if env.viewer is not None else 32
    if chunk_size > 1 and env.viewer is None:
        return _infer_chunked(env, net, policy_params, frozen_params,
                              log_path, num_episodes, max_steps,
                              stochastic, seed, trainee_idx, chunk_size,
                              trajectory_log, static_log, episode_counts)

    step = 0
    while step < max_steps:
        actions = policy(obs)
        if env.viewer is not None and \
                controller_manager.is_human_control_active():
            # scripts/infer.py:91-109: override world 0's selected agent.
            human_action = env.viewer.get_human_action()
            human_idx = env.viewer.get_selected_agent_index()
            obs, reward, done = env.step_with_world_actions(
                actions, human_action_world_0=human_action,
                human_agent_idx=human_idx)
        else:
            obs, reward, done = env.step(actions)
        if log_path:
            t = env.tensors()
            trajectory_log.append({
                "agent_pos": np.asarray(t["agent_pos"]),
                "ball_pos": np.asarray(t["basketball_pos"]),
                "ball_vel": np.asarray(t["ball_velocity"]),
                "orientation": np.asarray(t["orientation"]),
                "ball_physics": np.asarray(t["ball_physics"]),
                "agent_possession": np.asarray(t["agent_possession"]),
                "game_state": np.asarray(t["game_state"]),
                "rewards": np.asarray(t["reward"]),
                "actions": np.asarray(t["action"]),
                "done": np.asarray(done),
            })
        if num_episodes > 0:
            episode_counts += np.asarray(done).astype(np.int64)
            if np.all(episode_counts >= num_episodes):
                print(f"All environments have completed "
                      f"{num_episodes} episodes.")
                break
        step += 1

    if log_path and trajectory_log:
        episode_log = {k: np.array([e[k] for e in trajectory_log])
                       for k in trajectory_log[0]}
        static_log["num_episodes"] = num_episodes
        np.savez_compressed(log_path, **static_log, **episode_log)
        print(f"Finished logging. Trajectory saved to {log_path}")
    print("Inference Complete")
    return episode_counts


def _infer_chunked(env, net, policy_params, frozen_params, log_path,
                   num_episodes, max_steps, stochastic, seed, trainee_idx,
                   chunk_size, trajectory_log, static_log, episode_counts):
    use_frozen = frozen_params is not None or env.frozen_policy is not None
    if use_frozen and frozen_params is None:
        raise ValueError("chunked eval with a frozen opponent needs "
                         "frozen_params (AgentParams), not a host "
                         "callable; pass chunk_size=1 to keep the "
                         "per-step path")
    chunk_fn = _make_eval_chunk(env.cfg, net, trainee_idx, stochastic,
                                use_frozen, chunk_size, num_episodes)
    # Exact tail: a shorter chunk for the final max_steps % K steps, so
    # the sim state never advances past max_steps.  Episode completion
    # stops the on-device while_loop at the exact tick, so chunked ==
    # per-step everywhere.
    tail = max_steps % chunk_size
    tail_fn = _make_eval_chunk(env.cfg, net, trainee_idx, stochastic,
                               use_frozen, tail, num_episodes) \
        if tail else None
    fp = frozen_params if use_frozen else policy_params  # unused filler
    key = jax.random.PRNGKey(seed)
    state = env.state
    counts_dev = jax.numpy.zeros((env.num_worlds,), jax.numpy.int32)
    step = 0
    while step < max_steps:
        K = chunk_size if max_steps - step >= chunk_size else tail
        fn = chunk_fn if K == chunk_size else tail_fn
        state, key, counts_dev, t_used, logs = fn(
            state, policy_params, fp, key, counts_dev)
        t_used = int(t_used)
        logs_np = jax.device_get(logs)  # ONE fetch per chunk
        for t in range(t_used):
            if log_path:
                trajectory_log.append(
                    {k: np.asarray(v[t]) for k, v in logs_np.items()})
        step += t_used
        if num_episodes > 0:
            episode_counts[:] = np.asarray(jax.device_get(counts_dev),
                                           np.int64)
            if np.all(episode_counts >= num_episodes):
                print(f"All environments have completed "
                      f"{num_episodes} episodes.")
                break
    env.state = state

    if log_path and trajectory_log:
        episode_log = {k: np.array([e[k] for e in trajectory_log])
                       for k in trajectory_log[0]}
        static_log["num_episodes"] = num_episodes
        np.savez_compressed(log_path, **static_log, **episode_log)
        print(f"Finished logging. Trajectory saved to {log_path}")
    print("Inference Complete")
    return episode_counts


def multi_gen_infer(model_name: str, num_envs: int = 10,
                    frozen_checkpoint: str = None, trainee_idx: int = 1,
                    num_episodes: int = 5, max_steps: int = 10000,
                    stochastic: bool = True, test_seed: int = 0,
                    checkpoint_dir: str = "checkpoints",
                    cfg: SimConfig = None):
    """Evaluate every `{model}_*.ckpt` generation on a fixed seed
    (scripts/infer.py:154-186)."""
    cfg = cfg or SimConfig()
    net, template = init_agent(jax.random.PRNGKey(0))
    search_dir = os.path.join(checkpoint_dir, model_name)
    if not os.path.isdir(search_dir):
        search_dir = checkpoint_dir
    ckpts = sorted(f for f in os.listdir(search_dir)
                   if f.startswith(f"{model_name}_") and f.endswith(".ckpt"))
    print(f"Found {len(ckpts)} checkpoints to test: {ckpts}")
    for name in ckpts:
        path = os.path.join(search_dir, name)
        log_path = f"logs/mgi/{model_name}_/{name.replace('.ckpt', '.npz')}"
        print(f"Testing checkpoint: {path} -> {log_path}")
        frozen_fn, frozen_params = None, None
        if frozen_checkpoint:
            frozen_params = load_agent(frozen_checkpoint, template)
            frozen_fn = make_policy_fn(net, frozen_params,
                                       jax.random.PRNGKey(test_seed + 1),
                                       True)
        env = BasketballEnv(num_envs, cfg, seed=test_seed,
                            frozen_policy=frozen_fn,
                            trainee_agent_idx=trainee_idx)
        params = load_agent(path, template)
        infer(env, net, params, log_path, num_episodes, max_steps,
              stochastic, seed=test_seed, trainee_idx=trainee_idx,
              frozen_params=frozen_params)


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate checkpoints")
    p.add_argument("--model-name", type=str, default=None)
    p.add_argument("--trainee-idx", type=int, default=1)
    p.add_argument("--trainee-checkpoint", type=str, default=None)
    p.add_argument("--frozen-checkpoint", type=str, default=None)
    p.add_argument("--log-path", type=str,
                   default="logs/inference_trajectories.npz")
    p.add_argument("--max-steps", type=int, default=10000)
    p.add_argument("--num-episodes", type=int, default=5)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--num-envs", type=int, default=10)
    p.add_argument("--test-seed", type=int, default=0)
    p.add_argument("--viewer", action="store_true", default=False,
                   help="embedded live viewer during eval; press H to "
                        "take over world 0's selected agent")
    args = p.parse_args(argv)
    from .utils.profiling import enable_compile_cache, honor_platform_env
    honor_platform_env()
    enable_compile_cache()

    if args.model_name is None:
        cfg = SimConfig()
        net, template = init_agent(jax.random.PRNGKey(0))
        frozen_fn, frozen_params = None, None
        if args.frozen_checkpoint:
            frozen_params = load_agent(args.frozen_checkpoint, template)
            frozen_fn = make_policy_fn(net, frozen_params,
                                       jax.random.PRNGKey(args.test_seed + 1),
                                       True)
        viewer = None
        if args.viewer:
            from .viewer.app import ViewerClass
            viewer = ViewerClass()
        env = BasketballEnv(args.num_envs, cfg, seed=args.test_seed,
                            frozen_policy=frozen_fn,
                            trainee_agent_idx=args.trainee_idx,
                            viewer=viewer)
        if viewer is not None:
            viewer.env = env
        params = load_agent(args.trainee_checkpoint, template)
        infer(env, net, params, args.log_path, args.num_episodes,
              args.max_steps, not args.deterministic, seed=args.test_seed,
              trainee_idx=args.trainee_idx, frozen_params=frozen_params)
    else:
        multi_gen_infer(args.model_name, args.num_envs,
                        args.frozen_checkpoint, args.trainee_idx,
                        args.num_episodes, args.max_steps,
                        not args.deterministic, args.test_seed)


if __name__ == "__main__":
    main()
