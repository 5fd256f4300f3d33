"""PPO hyperparameters — defaults match the reference exactly
(scripts/ppo.py:24-57)."""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PPOParams:
    num_envs: int = 8192
    num_rollout_steps: int = 32
    learning_rate: float = 3e-4
    gamma: float = 0.998
    gae_lambda: float = 0.95
    num_minibatches: int = 4
    update_epochs: int = 4
    clip_coef: float = 0.2
    clip_vloss: bool = True
    ent_coef: float = 0.01
    vf_coef: float = 1.0
    max_grad_norm: float = 1.0
    trainee_idx: int = 1
    use_frozen: bool = False  # frozen-opponent self-play branch
    record_world0: bool = False  # emit world-0 telemetry for the viewer
    shuffle_block: int = 8
    # ^ epoch shuffles permute blocks of this many CONSECUTIVE flat
    # samples as one unit.  TPU gathers are row-count-bound (~19 ns/row
    # regardless of width), so shuffling 8-sample super-rows cuts the
    # update's shuffle cost ~8x.  Consecutive flat indices are the SAME
    # timestep of adjacent envs (buffer layout (T, N)) — near-i.i.d., so
    # minibatch decorrelation is preserved; set 1 for the reference's
    # exact sample-granularity shuffle (scripts/ppo.py:188).
    # Applies to the materialized-gather update paths (scan trainer,
    # rollout-kernel trainer with fused_grads=False).
    update_block: int = 0
    # ^ shuffle granularity of the FUSED-GRADIENT update path (the
    # scalar-prefetch kernel, ops/fused_update.py): the epoch
    # permutation deals blocks of `update_block` consecutive worlds at
    # one tick straight from the trajectory buffer — zero shuffle data
    # movement.  0 = auto (largest divisor of the world count and the
    # minibatch size <= 4096, ops/fused_update.pick_update_block;
    # 4096 since round 5 — timing + convergence A/B in BENCHMARKS.md).

    @property
    def rollout_batch_size(self) -> int:
        return self.num_envs * self.num_rollout_steps

    @property
    def minibatch_size(self) -> int:
        return self.rollout_batch_size // self.num_minibatches
