"""Device-mesh sharding for multi-chip / multi-host scaling.

The reference is single-process, single-GPU (scripts/ppo.py:226-227; SURVEY
§2.6) — its only parallel axis is the batched-env world dimension inside one
device.  Here that world axis becomes a `jax.sharding.Mesh` data axis: the
env state pytree is sharded on its leading world dimension, learner
parameters are replicated, and XLA inserts the gradient all-reduce (psum
over ICI/DCN) automatically when the jitted train iteration runs on sharded
inputs.

Multi-host entry: call `jax.distributed.initialize()` per host before
building the mesh with all devices; worlds then shard across hosts and the
same jitted program runs SPMD.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def _shard_leading(mesh: Mesh, x, axis_name: str = DATA_AXIS):
    spec = P(axis_name, *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
    return jax.device_put(x, NamedSharding(mesh, spec))


def _replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_env_state(env_state, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Shard every component column on its leading (world) axis."""
    return jax.tree.map(lambda x: _shard_leading(mesh, x, axis_name),
                        env_state)


def shard_train_state(ts, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Env + per-env stats sharded over the data axis; learner replicated.

    The already-jitted train iteration then runs SPMD: rollout math is local
    to each shard, and the minibatch gradient reduction becomes an
    all-reduce inserted by XLA because parameters are replicated.
    """
    env = shard_env_state(ts.env, mesh, axis_name)
    stats = ts.stats.replace(
        curr_rewards=_shard_leading(mesh, ts.stats.curr_rewards, axis_name),
        episode_lengths=_shard_leading(mesh, ts.stats.episode_lengths,
                                       axis_name),
        mean_reward=_replicate(mesh, ts.stats.mean_reward),
        reward_size=_replicate(mesh, ts.stats.reward_size),
        mean_length=_replicate(mesh, ts.stats.mean_length),
        length_size=_replicate(mesh, ts.stats.length_size),
    )
    rep = lambda t: jax.tree.map(lambda x: _replicate(mesh, x), t)  # noqa
    return ts.replace(
        agent=rep(ts.agent),
        frozen=rep(ts.frozen),
        opt_state=rep(ts.opt_state),
        env=env,
        stats=stats,
        key=_replicate(mesh, ts.key),
        iteration=_replicate(mesh, ts.iteration),
    )


def shard_fused_train_state(ts, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Shard a ppo.train_fused.FusedTrainState: SF/SI/OBS row matrices split
    on their world (last) axis, per-world keys on their leading axis,
    learner replicated."""
    def shard_last(x):
        spec = P(*([None] * (x.ndim - 1) + [axis_name]))
        return jax.device_put(x, NamedSharding(mesh, spec))

    rep = lambda t: jax.tree.map(lambda x: _replicate(mesh, x), t)  # noqa
    stats = ts.stats.replace(
        curr_rewards=_shard_leading(mesh, ts.stats.curr_rewards, axis_name),
        episode_lengths=_shard_leading(mesh, ts.stats.episode_lengths,
                                       axis_name),
        mean_reward=_replicate(mesh, ts.stats.mean_reward),
        reward_size=_replicate(mesh, ts.stats.reward_size),
        mean_length=_replicate(mesh, ts.stats.mean_length),
        length_size=_replicate(mesh, ts.stats.length_size),
    )
    return ts.replace(
        agent=rep(ts.agent), frozen=rep(ts.frozen),
        opt_state=rep(ts.opt_state),
        sf=shard_last(ts.sf), si=shard_last(ts.si), obs=shard_last(ts.obs),
        env_keys=_shard_leading(mesh, ts.env_keys, axis_name),
        stats=stats, key=_replicate(mesh, ts.key),
        iteration=_replicate(mesh, ts.iteration),
    )
