"""In-process self-play league.

Replaces the reference's subprocess-spawning league driver
(scripts/self_play.py:34-159) — which shells out `python3 scripts/ppo.py`
per generation and hands checkpoints over through the filesystem — with an
in-process loop that alternates trainee/frozen parameter pytrees directly.
The checkpoint naming contract (`{model}_gen_{g}` trained for
`iter_per_agent` iters, promoted to `checkpoints/{name}_{iters}.ckpt`) is
preserved so multi-generation evaluation (`infer.multi_gen_infer`) works the
same way.

Also keeps the (currently 0-probability) retired-opponent pool of the
reference (scripts/self_play.py:95-98,123-127,151-155).

CLI: python -m madrona_basketball_tpu.selfplay [...]
"""

from __future__ import annotations

import argparse
import random

import jax

from .config import SimConfig
from .models.agent import AgentParams, init_agent
from .ppo.hparams import PPOParams
from .ppo.train_fused import (init_fused_train_state,
                              make_train_iteration_fused)
from .utils.checkpoint import checkpoint_path, load_agent, save_agent


def train_generation(cfg: SimConfig, hp: PPOParams, net, key,
                     trainee: AgentParams, frozen: AgentParams,
                     num_iterations: int, model_name: str,
                     save_every: int, log_every: int = 100) -> AgentParams:
    """One training session: trainee vs frozen opponent (scripts/ppo.py main
    recipe at self-play scale), on the fused engine."""
    backend = "pallas" if jax.devices()[0].platform == "tpu" else "xla"
    # The policy-in-the-loop rollout kernel makes the frozen-opponent
    # forward essentially free (both policies run inside the kernel);
    # TPU-only.
    rollout_kernel = backend == "pallas"
    ts = init_fused_train_state(cfg, hp, net, key, agent=trainee,
                                frozen=frozen)
    # fused_gae follows the CLI default: ON for the flagship rollout-
    # kernel path (16-21 % faster per iteration at every world count,
    # BENCHMARKS.md round 4).
    it = make_train_iteration_fused(cfg, hp, net, backend=backend,
                                    rollout_kernel=rollout_kernel,
                                    fused_gae=rollout_kernel)
    # Fuse iterations into one dispatch per block (host round-trips
    # dominate wall clock on remote-attached devices; see ppo/train.py).
    from .ppo.train import auto_chunk, make_train_chunk, unstack_metrics
    chunk_n = max(1, min(auto_chunk(log_every, save_every),
                         num_iterations))
    chunk = make_train_chunk(it, chunk_n) if chunk_n > 1 else None

    iteration = 0
    while iteration < num_iterations:
        if chunk is not None and num_iterations - iteration >= chunk_n:
            ts, stacked = chunk(ts)
            metric_list = unstack_metrics(stacked, chunk_n)
        else:
            ts, m = it(ts)
            metric_list = [m]
        for metrics in metric_list:
            iteration += 1
            if iteration % log_every == 0:
                jax.block_until_ready(ts.agent.params)
                print(f"  [{model_name}] iter {iteration}: "
                      f"mean_reward={float(metrics['mean_reward']):.3f} "
                      f"mean_len={float(metrics['mean_episode_length']):.1f}")
            if iteration % save_every == 0:
                save_agent(ts.agent, checkpoint_path(model_name, iteration))
    return ts.agent


def run_league(num_training_cycles: int = 5, iter_per_agent: int = 5000,
               num_envs: int = 8192, first_trainee_idx: int = 1,
               model_name_0: str = "model_0", model_name_1: str = "model_1",
               seed: int = 0, cfg: SimConfig = None,
               checkpoint_0: str = None, checkpoint_1: str = None):
    cfg = cfg or SimConfig()
    net, template = init_agent(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(seed)

    # Initial random policies for both roles (scripts/self_play.py:70-92).
    key, k0, k1 = jax.random.split(key, 3)
    if checkpoint_0:
        agent0 = load_agent(checkpoint_0, template)
    else:
        _, agent0 = init_agent(k0)
        save_agent(agent0, "checkpoints/model_0_initial.ckpt")
    if checkpoint_1:
        agent1 = load_agent(checkpoint_1, template)
    else:
        _, agent1 = init_agent(k1)
        save_agent(agent1, "checkpoints/model_1_initial.ckpt")

    agents = {0: agent0, 1: agent1}
    names = {0: model_name_0, 1: model_name_1}
    save_every = max(1, iter_per_agent // 10)

    # Retired-model pool (scripts/self_play.py:95-98): kept for parity;
    # the reference sets the replay probability to 0.
    model_pool: list[AgentParams] = []
    max_models_in_pool = 3
    probability_old_opponent = 0

    for generation in range(num_training_cycles):
        for phase, trainee_idx in enumerate(
                (first_trainee_idx, 1 - first_trainee_idx)):
            frozen_idx = 1 - trainee_idx
            model_name = f"{names[trainee_idx]}_gen_{generation}"
            print(f"\n🔄 GENERATION {generation} phase {phase}: "
                  f"training agent {trainee_idx} ({model_name}) vs frozen "
                  f"agent {frozen_idx}")
            model_pool.append(agents[trainee_idx])
            if len(model_pool) > 2 * max_models_in_pool:
                del model_pool[0:2]

            hp = PPOParams(num_envs=num_envs, trainee_idx=trainee_idx,
                           use_frozen=True)
            key, k = jax.random.split(key)
            frozen = agents[frozen_idx]
            if random.randint(1, 100) <= probability_old_opponent \
                    and model_pool:
                frozen = random.choice(model_pool)
                print("  (facing a retired opponent this session)")
            agents[trainee_idx] = train_generation(
                cfg, hp, net, k, agents[trainee_idx], frozen,
                iter_per_agent, model_name, save_every)
        print(f"\n✅ Cycle {generation}/{num_training_cycles - 1} complete.")
    return agents


def main(argv=None):
    p = argparse.ArgumentParser(description="Self-play league")
    p.add_argument("--num-training-cycles", type=int, default=5)
    p.add_argument("--iter-per-agent", type=int, default=5000)
    p.add_argument("--num-envs", type=int, default=8192)
    p.add_argument("--first-trainee-idx", type=int, default=1)
    p.add_argument("--model-name-0", type=str, default="model_0")
    p.add_argument("--model-name-1", type=str, default="model_1")
    p.add_argument("--checkpoint-0", type=str, default=None)
    p.add_argument("--checkpoint-1", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    from .utils.profiling import enable_compile_cache, honor_platform_env
    honor_platform_env()
    enable_compile_cache()
    run_league(args.num_training_cycles, args.iter_per_agent, args.num_envs,
               args.first_trainee_idx, args.model_name_0, args.model_name_1,
               args.seed, checkpoint_0=args.checkpoint_0,
               checkpoint_1=args.checkpoint_1)


if __name__ == "__main__":
    main()
