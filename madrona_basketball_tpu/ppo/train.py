"""On-device PPO: rollout, GAE, and update as one jitted iteration.

Replaces the reference's host-loop trainer (scripts/ppo.py:60-216) with a
fully fused XLA program: the 32-step rollout is a `lax.scan` whose body is
policy forward + the vectorized env step (no host round-trips — the
reference's per-step Python->C++ crossing is the anti-pattern this design
removes), GAE is a reverse scan, and the 4-epoch x 4-minibatch Adam update
is a nested scan over device-side permutations.

Faithfully reproduced reference contracts:
  * `env.reset()` is called at the START of every iteration and only pulses
    the Reset flag — done=1/cur_step=0 bookkeeping without repositioning
    (scripts/ppo.py:64, scripts/env.py:178-185, SURVEY §3.3).
  * Values are stored in normalized space, un-normalized for GAE, then the
    normalizers are updated and advantages/values/returns re-normalized in
    place (scripts/ppo.py:144-177).
  * Adam(lr=3e-4, eps=1e-8) after global-norm clipping at 1.0
    (scripts/ppo.py:301, 214).

One deliberate deviation: the default epoch shuffle permutes 8-sample
super-rows instead of single samples (PPOParams.shuffle_block — TPU
gathers are row-count-bound; 3000-iteration curves plateau identically).
Set shuffle_block=1 for the reference's exact sample-granularity shuffle
(scripts/ppo.py:188).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .. import constants as C
from .. import engine
from ..config import SimConfig
from ..models import agent as agent_lib
from ..models.agent import ActorCritic, AgentParams
from ..models.normalize import rms_normalize, rms_update
from ..ops.gae import compute_gae
from ..state import State
from .hparams import PPOParams

F32 = jnp.float32
I32 = jnp.int32


@struct.dataclass
class EpisodeStats:
    """Device-side port of PPOStats + AverageMeter(window=100)
    (scripts/ppo_stats.py:8-50, 153-172)."""

    curr_rewards: jax.Array      # (N,)
    episode_lengths: jax.Array   # (N,)
    mean_reward: jax.Array       # ()
    reward_size: jax.Array       # ()
    mean_length: jax.Array       # ()
    length_size: jax.Array       # ()


def init_stats(num_envs: int) -> EpisodeStats:
    z = jnp.zeros((), F32)
    return EpisodeStats(curr_rewards=jnp.zeros((num_envs,), F32),
                        episode_lengths=jnp.zeros((num_envs,), F32),
                        mean_reward=z, reward_size=z, mean_length=z,
                        length_size=z)


def _meter_update(mean, cur_size, values_sum, count, max_size=100.0):
    """AverageMeter.update with a masked batch (scripts/ppo_stats.py:160-167)."""
    has = count > 0
    new_mean = jnp.where(has, values_sum / jnp.maximum(count, 1.0), 0.0)
    size = jnp.minimum(count, max_size)
    old_size = jnp.minimum(max_size - size, cur_size)
    total = old_size + size
    merged = jnp.where(has, (mean * old_size + new_mean * size) /
                       jnp.maximum(total, 1.0), mean)
    return merged, jnp.where(has, total, cur_size)


def _stats_step(st: EpisodeStats, rew, done) -> EpisodeStats:
    curr = st.curr_rewards + rew
    lens = st.episode_lengths + 1.0
    count = jnp.sum(done)
    r_mean, r_size = _meter_update(st.mean_reward, st.reward_size,
                                   jnp.sum(curr * done), count)
    l_mean, l_size = _meter_update(st.mean_length, st.length_size,
                                   jnp.sum(lens * done), count)
    return EpisodeStats(curr_rewards=curr * (1.0 - done),
                        episode_lengths=lens * (1.0 - done),
                        mean_reward=r_mean, reward_size=r_size,
                        mean_length=l_mean, length_size=l_size)


@struct.dataclass
class TrainState:
    agent: AgentParams
    frozen: AgentParams       # opponent params (ignored unless hp.use_frozen)
    opt_state: Any
    env: State                # batched world state
    stats: EpisodeStats
    key: jax.Array
    iteration: jax.Array      # () i32


def make_optimizer(hp: PPOParams) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(hp.max_grad_norm),
        optax.adam(hp.learning_rate, eps=1e-8),
    )


def make_minibatch_update(hp: PPOParams):
    """Shared epochs x shuffled-minibatches update skeleton
    (scripts/ppo.py:180-216), used by BOTH trainers.

    Everything a minibatch needs rides in ONE (total, D+K+4) f32 matrix
    (actions are small ints, exact in f32) so the per-epoch shuffle is a
    single bulk row-gather, and minibatches are contiguous slices (scan
    leading axis).  Separate gathers for the narrow arrays each cost as
    much as the wide obs gather — per-row overhead dominates TPU gathers
    — and per-minibatch fancy indexing was ~40% of a whole training
    iteration.

    Returns update(grad_step, params, opt_state, buf, advantages,
    values_n, returns_n, key) -> (params, opt_state) where
    grad_step((params, opt_state), o, a, lp, v, adv, ret) applies one
    minibatch gradient step.
    """

    # Super-row shuffle: see PPOParams.shuffle_block.
    G = hp.shuffle_block
    if G < 1:
        import warnings
        warnings.warn(f"shuffle_block={G} is invalid (must be >= 1); "
                      "using sample-exact shuffling", stacklevel=2)
        G = 1
    if G > 1 and hp.minibatch_size % G:
        import warnings
        warnings.warn(
            f"shuffle_block={G} does not divide minibatch_size="
            f"{hp.minibatch_size}; falling back to sample-exact shuffling",
            stacklevel=2)
        G = 1

    def run_epochs(grad_step, params, opt_state, feat, D, K, key,
                   raw_feat: bool = False):
        """Epochs x shuffled minibatches over a PREBUILT feat matrix
        (total, F) whose first D + K + 4 columns are obs | actions |
        log_prob | value_n | advantage | return_n (F may carry trailing
        padding columns, which are ignored).

        raw_feat=True hands grad_step the whole (minibatch, F) matrix
        instead of sliced columns — the contract of the fused Pallas
        gradient kernel (ops/fused_update.py), which does its own
        column slicing on-chip."""
        total = hp.rollout_batch_size
        F = feat.shape[-1]
        # 3-D super-rows: the gather permutes dim 0 and the post-gather
        # reshape merges LEADING dims only (free), instead of a 2-D
        # (rows, G*F) form whose reshape back to F columns is a paid
        # relayout (~2.6 ms/iter at 8192 envs).
        featG = feat.reshape(total // G, G, F)
        rows = total // G

        def mb_body(carry, fe):
            fe = fe.reshape(hp.minibatch_size, F)
            if raw_feat:
                return grad_step(carry, fe), None
            o = fe[:, :D]
            a = fe[:, D:D + K].astype(I32)
            return grad_step(carry, o, a, fe[:, D + K],
                             fe[:, D + K + 1], fe[:, D + K + 2],
                             fe[:, D + K + 3]), None

        def epoch_body(carry, perm):
            feat_e = featG[perm].reshape(
                hp.num_minibatches, hp.minibatch_size // G, G, F)
            carry, _ = jax.lax.scan(mb_body, carry, feat_e)
            return carry, None

        # All epochs' permutations in ONE batched argsort (argsort of iid
        # draws per row == an independent uniform permutation per row,
        # the same construction jax.random.permutation uses internally) —
        # a device sort costs ~0.4-1.7 ms, so batching the E sorts into
        # one saves most of that cost E-1 times over.  Sorting uint32
        # bits instead of f32 uniforms: f32 keys take only 2^24 values,
        # so at production row counts ties (always broken in ascending
        # index order) would add a small systematic non-uniformity.
        perms = jnp.argsort(
            jax.random.bits(key, (hp.update_epochs, rows), jnp.uint32),
            axis=1)
        (params, opt_state), _ = jax.lax.scan(
            epoch_body, (params, opt_state), perms)
        return params, opt_state

    def update(grad_step, params, opt_state, buf, advantages, values_n,
               returns_n, key):
        total = hp.rollout_batch_size
        obs = buf["obs"].reshape(total, -1)
        D = obs.shape[-1]
        K = buf["actions"].shape[-1]
        feat = jnp.concatenate([
            obs,
            buf["actions"].reshape(total, K).astype(F32),
            buf["log_probs"].reshape(total, 1),
            values_n.reshape(total, 1),
            advantages.reshape(total, 1),
            returns_n.reshape(total, 1)], axis=-1)
        return run_epochs(grad_step, params, opt_state, feat, D, K, key)

    update.run_epochs = run_epochs
    return update


def make_update_fns(hp: PPOParams, net: ActorCritic):
    """The iteration's post-rollout phase, shared by ALL trainers
    (structured scan, fused kernel, interactive host-loop):

      compute_advantages(agent, buf) — un-normalize values, reverse-scan
        GAE, update obs/value normalizers, re-normalize adv/values/returns
        in place (scripts/ppo.py:144-177);
      update_policy(agent, opt_state, buf, adv, values_n, returns_n, key)
        — epochs x shuffled minibatches of the clipped PPO objective
        (scripts/ppo.py:180-216).

    buf: dict with obs (T,N,D), actions (T,N,K), values/log_probs/
    not_dones/rewards (T,N), next_value (N,)."""
    tx = make_optimizer(hp)
    mb_update = make_minibatch_update(hp)

    def compute_advantages(agent: AgentParams, buf):
        values = agent_lib.unnorm_value(agent, buf["values"])
        next_value = agent_lib.unnorm_value(agent, buf["next_value"])
        advantages, returns = compute_gae(
            buf["rewards"], values, buf["not_dones"], next_value,
            hp.gamma, hp.gae_lambda)

        obs_rms = rms_update(agent.obs_rms,
                             buf["obs"].reshape(-1, buf["obs"].shape[-1]))
        value_rms = rms_update(agent.value_rms, values.reshape(-1, 1))
        value_rms = rms_update(value_rms, returns.reshape(-1, 1))
        agent = agent.replace(obs_rms=obs_rms, value_rms=value_rms)

        mu = advantages.mean()
        sigma = advantages.std(ddof=1)  # torch .std() is unbiased
        advantages = (advantages - mu) / (sigma + 1e-8)
        values_n = rms_normalize(value_rms, values.reshape(-1, 1),
                                 clamp=5.0).reshape(values.shape)
        returns_n = rms_normalize(value_rms, returns.reshape(-1, 1),
                                  clamp=5.0).reshape(returns.shape)
        return agent, advantages, values_n, returns_n

    def _stats(params, agent: AgentParams, o, a):
        """get_stats that also accepts PACKED observations (o narrower
        than the net's input): features >= o.shape[-1] are structurally
        zero (constants.OBS_USED), so normalizing the packed slots and
        applying a row-sliced first Dense kernel is bit-identical to the
        full-width forward — and the gradient of the slice scatters back
        into the full parameter tree with exact zeros for the unused
        rows, just as the zero inputs would produce."""
        D = o.shape[-1]
        full = agent.obs_rms.mean.shape[0]
        if D == full:
            return agent_lib.get_stats(net, agent.replace(params=params),
                                       o, a)
        from ..models.normalize import EPS
        rms = agent.obs_rms
        x = jnp.clip((o - rms.mean[:D]) * jax.lax.rsqrt(rms.var[:D] + EPS),
                     -5.0, 5.0)
        pp = dict(params["params"])
        d0 = dict(pp["Dense_0"])
        d0["kernel"] = d0["kernel"][:D]
        p2 = {"params": {**pp, "Dense_0": d0}}
        logits, value = net.apply(p2, x)
        from ..models import action as action_dist
        lps, ents = action_dist.action_stats(logits, a, C.ACTION_BUCKETS)
        return lps.sum(axis=-1), ents.sum(axis=-1), value

    def loss_fn(params, agent: AgentParams, o, a, lp, v, adv, ret):
        """Clipped PPO surrogate + clipped value loss + entropy
        (scripts/ppo.py:192-210)."""
        lp_, ent, v_ = _stats(params, agent, o, a)
        ratio = jnp.exp(lp_ - lp)
        surr1 = -adv * ratio
        surr2 = -adv * jnp.clip(ratio, 1 - hp.clip_coef, 1 + hp.clip_coef)
        pg_loss = jnp.maximum(surr1, surr2).mean()

        vf_loss = (v_ - ret) ** 2
        v_clip = v + jnp.clip(v_ - v, -hp.clip_coef, hp.clip_coef)
        vf_loss_clip = (v_clip - ret) ** 2
        if hp.clip_vloss:
            c_loss = 0.5 * jnp.maximum(vf_loss, vf_loss_clip).mean()
        else:
            c_loss = 0.5 * vf_loss.mean()
        entropy_loss = -ent.mean()
        loss = (pg_loss + c_loss * hp.vf_coef + entropy_loss * hp.ent_coef)
        return loss, (pg_loss, c_loss, entropy_loss)

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def _grad_step_for(agent):
        def grad_step(carry, o, a, lp, v, adv, ret):
            params, opt_state = carry
            grads, _aux = grad_fn(params, agent, o, a, lp, v, adv, ret)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state

        return grad_step

    def update_policy(agent: AgentParams, opt_state, buf, advantages,
                      values_n, returns_n, key):
        params, opt_state = mb_update(_grad_step_for(agent), agent.params,
                                      opt_state, buf, advantages, values_n,
                                      returns_n, key)
        return agent.replace(params=params), opt_state

    def update_policy_feat(agent: AgentParams, opt_state, feat, D, K, key):
        """Same update over a prebuilt feat matrix (see
        make_minibatch_update.run_epochs) — the zero-copy path for the
        rollout kernel's feature-major trajectory buffer."""
        params, opt_state = mb_update.run_epochs(
            _grad_step_for(agent), agent.params, opt_state, feat, D, K, key)
        return agent.replace(params=params), opt_state

    update_policy.with_feat = update_policy_feat
    update_policy.loss_fn = loss_fn  # exposed for gradient cross-checks
    return compute_advantages, update_policy


def init_train_state(cfg: SimConfig, hp: PPOParams, net: ActorCritic,
                     key: jax.Array,
                     agent: Optional[AgentParams] = None,
                     frozen: Optional[AgentParams] = None) -> TrainState:
    k_env, k_agent, k_frozen, k_run = jax.random.split(key, 4)
    if agent is None:
        _, agent = agent_lib.init_agent(k_agent)
    if frozen is None:
        _, frozen = agent_lib.init_agent(k_frozen)
    env = engine.init_batch(cfg, k_env, hp.num_envs)
    tx = make_optimizer(hp)
    return TrainState(agent=agent, frozen=frozen,
                      opt_state=tx.init(agent.params), env=env,
                      stats=init_stats(hp.num_envs), key=k_run,
                      iteration=jnp.zeros((), I32))


def make_train_iteration(cfg: SimConfig, hp: PPOParams, net: ActorCritic):
    """Build the jitted `train_iteration(ts) -> (ts, metrics)`."""

    ti = hp.trainee_idx
    fi = 1 - ti
    T = hp.num_rollout_steps
    vstep = jax.vmap(lambda w: engine.step(cfg, w))
    compute_advantages, update_policy = make_update_fns(hp, net)

    def write_actions(env: State, trainee_actions, frozen_actions):
        acts = env.agents.action
        acts = acts.at[:, ti].set(trainee_actions.astype(I32))
        if hp.use_frozen:
            acts = acts.at[:, fi].set(frozen_actions.astype(I32))
        return env.replace(agents=env.agents.replace(action=acts))

    def frozen_forward(frozen: AgentParams, env: State, key):
        if not hp.use_frozen:
            return None
        obs = env.agents.obs[:, fi]
        actions, _, _ = agent_lib.forward(net, frozen, obs, key)
        return actions

    def reset_pulse(agent, frozen, env: State, key):
        """scripts/env.py:178-185: Reset flags high for exactly one step."""
        env = env.replace(agents=env.agents.replace(
            reset=jnp.ones_like(env.agents.reset)))
        fa = frozen_forward(frozen, env, key)
        env = write_actions(env, jnp.zeros((hp.num_envs, 6), I32), fa)
        env = vstep(env)
        env = env.replace(agents=env.agents.replace(
            reset=jnp.zeros_like(env.agents.reset)))
        return env

    def rollout(agent, frozen, env, stats, key):
        key, k0 = jax.random.split(key)
        env = reset_pulse(agent, frozen, env, k0)
        obs0 = env.agents.obs[:, ti]

        def body(carry, _):
            env, obs, stats, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            actions, logp, value = agent_lib.forward(net, agent, obs, k1)
            fa = frozen_forward(frozen, env, k2)
            env = write_actions(env, actions, fa)
            env = vstep(env)
            obs_ = env.agents.obs[:, ti]
            rew = env.agents.reward[:, ti]
            done = env.agents.done[:, ti]
            stats = _stats_step(stats, rew, done)
            out = (obs, actions, value, logp, 1.0 - done, rew)
            if hp.record_world0:
                out = out + (_world0_log(env, done),)
            return (env, obs_, stats, key), out

        (env, last_obs, stats, key), traj = jax.lax.scan(
            body, (env, obs0, stats, key), None, length=T)
        if hp.record_world0:
            obs_b, act_b, val_b, logp_b, notdone_b, rew_b, w0 = traj
        else:
            obs_b, act_b, val_b, logp_b, notdone_b, rew_b = traj
            w0 = None
        next_value = agent_lib.evaluate(net, agent, last_obs)
        return env, stats, key, dict(
            obs=obs_b, actions=act_b, values=val_b, log_probs=logp_b,
            not_dones=notdone_b, rewards=rew_b, next_value=next_value), w0

    @jax.jit
    def train_iteration(ts: TrainState):
        key, k_roll, k_upd = jax.random.split(ts.key, 3)
        env, stats, _k, buf, w0 = rollout(ts.agent, ts.frozen, ts.env,
                                          ts.stats, k_roll)
        agent, advantages, values_n, returns_n = compute_advantages(ts.agent,
                                                                    buf)
        agent, opt_state = update_policy(agent, ts.opt_state, buf,
                                         advantages, values_n, returns_n,
                                         k_upd)
        metrics = {
            "mean_reward": stats.mean_reward,
            "mean_episode_length": stats.mean_length,
            "reward_window": stats.reward_size,
            "adv_abs_mean": jnp.abs(advantages).mean(),
            "value_mean": values_n.mean(),
        }
        if hp.record_world0:
            metrics["world0"] = w0
        ts = ts.replace(agent=agent, opt_state=opt_state, env=env,
                        stats=stats, key=key, iteration=ts.iteration + 1)
        return ts, metrics

    return train_iteration


def _world0_log(env: State, done) -> dict:
    """World-0 per-step telemetry matching the reference's npz trajectory
    schema (scripts/ppo.py:93-105); shapes carry the leading world dim of 1."""
    a, b = env.agents, env.ball
    from ..export import game_state_tensor
    return {
        "agent_pos": a.pos[0:1],
        "ball_pos": b.pos[0:1][:, None, :],
        "ball_vel": b.vel[0:1][:, None, :],
        "orientation": a.orient[0:1],
        "ball_physics": jnp.stack(
            [b.in_flight, b.last_touched_agent, b.last_touched_team,
             b.shot_by_agent, b.shot_by_team, b.shot_point_value,
             b.shot_going_in], axis=-1)[0:1][:, None, :],
        "agent_possession": jnp.stack(
            [a.has_ball, a.held_ball_id, a.points_worth], axis=-1)[0:1],
        "game_state": game_state_tensor(env)[0:1],
        "rewards": a.reward[0:1],
        "actions": a.action[0:1],
        "done": done[0:1],
    }


def make_train_chunk(train_iteration, n_iters: int):
    """Fuse `n_iters` whole training iterations into ONE dispatch.

    chunk(ts) -> (ts, metrics) where each metrics leaf gains a leading
    (n_iters,) axis (one entry per iteration, in order).  Works with both
    trainers' iteration functions (they share the (ts) -> (ts, metrics)
    contract).  Exists because per-dispatch latency dominates wall-clock on
    remote-attached TPUs: one 30 ms iteration costs ~10x that when every
    iteration is its own host round-trip.
    """

    @jax.jit
    def chunk(ts):
        return jax.lax.scan(lambda t, _: train_iteration(t), ts, None,
                            length=n_iters)

    return chunk


def unstack_metrics(stacked, n: int) -> list:
    """Inverse of make_train_chunk's metric stacking: a pytree whose
    leaves carry a leading (n,) axis -> a list of n per-iteration
    pytrees, in order."""
    return [jax.tree_util.tree_map(lambda x, j=j: x[j], stacked)
            for j in range(n)]


def auto_chunk(log_every: int, save_every: int, cap: int = 50) -> int:
    """Largest iterations-per-dispatch that keeps log/save boundaries on
    chunk edges (a common divisor of both cadences, capped)."""
    import math
    g = math.gcd(max(1, log_every), max(1, save_every))
    best = 1
    for d in range(1, min(g, cap) + 1):
        if g % d == 0:
            best = d
    return best
