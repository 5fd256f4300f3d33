"""PPO trainer over the fused SoA row-layout engine.

Identical training semantics to ppo/train.py (same rollout contract, GAE,
normalizer flow, update math), but the environment lives as flat SF/SI row
matrices and each sim tick is the single fused Pallas kernel
(ops/fused_step.py) instead of the ~350-fusion structured step — the fast
path for TPU training and the one the benchmark exercises.  XLA also
compiles this dramatically faster: the kernel is one opaque call inside the
rollout scan instead of a 2000-op subgraph.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from .. import constants as C
from .. import engine
from ..config import SimConfig
from ..engine_fused import make_noise_fn
from ..models import agent as agent_lib
from ..models.agent import ActorCritic, AgentParams
from ..ops import layout
from ..ops.fused_step import fused_step_xla, make_fused_step
from .hparams import PPOParams
from .train import (EpisodeStats, _meter_update, _stats_step, init_stats,
                    make_optimizer, make_update_fns)

F32 = jnp.float32
I32 = jnp.int32

_ACTION_ROWS = [[layout.I_IDX[f"a{i}.{n}"] for n in
                 ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
                  "a_shoot")] for i in range(C.NUM_AGENTS)]
_RESET_ROWS = [layout.I_IDX[f"a{i}.reset"] for i in range(C.NUM_AGENTS)]


@struct.dataclass
class FusedTrainState:
    agent: AgentParams
    frozen: AgentParams
    opt_state: object
    sf: jax.Array        # (N_F32_ROWS, W)
    si: jax.Array        # (N_I32_ROWS, W)
    obs: jax.Array       # (N_OBS_ROWS, W)
    env_keys: jax.Array  # (W, 2) per-world PRNG keys
    stats: EpisodeStats
    key: jax.Array
    iteration: jax.Array


def init_fused_train_state(cfg: SimConfig, hp: PPOParams, net: ActorCritic,
                           key: jax.Array,
                           agent: Optional[AgentParams] = None,
                           frozen: Optional[AgentParams] = None,
                           host_init: Optional[bool] = None
                           ) -> FusedTrainState:
    """host_init (default: on for non-CPU backends; MBB_DEVICE_INIT=1
    forces off): build the world-init + pack programs on the HOST CPU
    backend and transfer the ~5 MB result, instead of remote-compiling
    them through the axon tunnel — the once-per-process init compile is
    the dominant code-side term of the fresh-process bill
    (BENCHMARKS.md round 5: ~41-54 s; the CPU build persists in the
    local compilation cache, so repeat processes pay ~0).  generate_
    world is threefry draws + elementwise arithmetic, so the
    cross-backend numerics seam is at most transcendental-ulp noise in
    spawn positions."""
    import os

    def build(agent, frozen):
        k_env, k_agent, k_frozen, k_run = jax.random.split(key, 4)
        if agent is None:
            _, agent = agent_lib.init_agent(k_agent)
        if frozen is None:
            _, frozen = agent_lib.init_agent(k_frozen)
        env = engine.init_batch(cfg, k_env, hp.num_envs)
        sf, si = layout.pack(env)
        tx = make_optimizer(hp)
        return FusedTrainState(
            agent=agent, frozen=frozen, opt_state=tx.init(agent.params),
            sf=sf, si=si,
            obs=jnp.zeros((layout.N_OBS_ROWS, hp.num_envs), F32),
            env_keys=env.key, stats=init_stats(hp.num_envs), key=k_run,
            iteration=jnp.zeros((), I32))

    if host_init is None:
        host_init = (jax.default_backend() != "cpu"
                     and os.environ.get("MBB_DEVICE_INIT") != "1")
    if host_init:
        try:
            _cpu = jax.devices("cpu")[0]
        except RuntimeError:
            host_init = False
    if not host_init:
        return build(agent, frozen)
    with jax.default_device(_cpu):
        ts = jax.block_until_ready(build(agent, frozen))
    return jax.device_put(ts, jax.devices()[0])


def make_train_iteration_fused(cfg: SimConfig, hp: PPOParams,
                               net: ActorCritic, backend: str = "pallas",
                               block: int = 2048, mesh=None,
                               rollout_kernel: bool = False,
                               rollout_interpret: bool = False,
                               fused_grads: bool = True,
                               fused_gae: bool = False,
                               rollout_block: int | None = None,
                               rollout_tiled: bool = False,
                               bf16_traj: bool = False,
                               bf16_policy: bool = False,
                               dp_update: bool = False):
    """`mesh`: optional jax.sharding.Mesh with a 'data' axis.  When given,
    the sim kernel runs under shard_map with worlds split across devices
    (a Pallas custom call does not auto-partition); everything else (policy,
    GAE, update) stays ordinary jit code — XLA partitions it from the input
    shardings and inserts the gradient all-reduce for the replicated
    learner.

    rollout_kernel=True replaces the scan-of-launches rollout with the
    policy-in-the-loop Pallas kernel (ops/fused_rollout.py): all T ticks
    of policy forward + sampling + sim run in ONE launch with the fleet
    state VMEM-resident.  Same training semantics; the PRNG stream
    differs (on-chip PRNG instead of jax.random), which is within the
    parity contract (SURVEY §2.3 — distribution parity only).  Requires
    backend="pallas" (TPU) and is incompatible with record_world0 (the
    per-tick world-0 telemetry needs the scan path)."""
    if rollout_kernel and hp.record_world0:
        raise ValueError("rollout_kernel does not support record_world0; "
                         "use the scan rollout (e.g. --viewer without "
                         "--rollout-kernel)")
    if rollout_kernel and backend != "pallas" and not rollout_interpret:
        raise ValueError("rollout_kernel requires the pallas backend (TPU); "
                         "pass rollout_interpret=True to dry-run on CPU")
    if fused_gae and not (rollout_kernel and fused_grads):
        raise ValueError("fused_gae requires rollout_kernel=True and "
                         "fused_grads=True (it consumes the trajectory "
                         "buffer's raw-side contract)")
    if rollout_tiled and not rollout_kernel:
        raise ValueError("rollout_tiled selects the 2-D-tiled variant of "
                         "the rollout kernel; pass rollout_kernel=True")
    if bf16_traj and not (fused_gae and not rollout_tiled):
        raise ValueError("bf16_traj requires the flagship path "
                         "(rollout_kernel + fused_grads + fused_gae, "
                         "untiled): only its Pallas consumers understand "
                         "the bf16 trajectory layout")
    if bf16_policy and not (rollout_kernel and not rollout_tiled):
        raise ValueError("bf16_policy selects bf16 matmul operands "
                         "inside the (untiled) rollout kernel; pass "
                         "rollout_kernel=True")
    if dp_update and not (mesh is not None and fused_gae
                          and not rollout_tiled):
        raise ValueError("dp_update shards the update phase over the "
                         "data mesh (per-minibatch gradient psum); it "
                         "requires a mesh and the (untiled) fused-GAE "
                         "flagship path")
    traj_dtype = jnp.bfloat16 if bf16_traj else F32
    ti = hp.trainee_idx
    fi = 1 - ti
    T = hp.num_rollout_steps
    tx = make_optimizer(hp)
    noise_fn = make_noise_fn(cfg)

    worlds_per_shard = hp.num_envs if mesh is None else \
        hp.num_envs // mesh.size
    if backend == "pallas":
        kernel = make_fused_step(cfg, worlds_per_shard, block=block)
    else:
        kernel = functools.partial(fused_step_xla, cfg)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        row_sharded = P(None, "data")
        kernel = shard_map(
            kernel, mesh=mesh,
            in_specs=(row_sharded, row_sharded, row_sharded),
            out_specs=(row_sharded, row_sharded, row_sharded),
            check_vma=False)

    ti_lo = ti * C.OBS_SIZE
    fi_lo = fi * C.OBS_SIZE
    rew_row = layout.F_IDX[f"a{ti}.reward"]
    done_row = layout.F_IDX[f"a{ti}.done"]

    def write_actions(si, trainee_actions, frozen_actions):
        for j in range(6):
            si = si.at[_ACTION_ROWS[ti][j]].set(
                trainee_actions[:, j].astype(I32))
        if hp.use_frozen:
            for j in range(6):
                si = si.at[_ACTION_ROWS[fi][j]].set(
                    frozen_actions[:, j].astype(I32))
        return si

    def frozen_forward(frozen, obs_rows, key):
        if not hp.use_frozen:
            return None
        obs = obs_rows[fi_lo:fi_lo + C.OBS_SIZE].T
        actions, _, _ = agent_lib.forward(net, frozen, obs, key)
        return actions

    def env_step(env_keys, sf, si):
        env_keys, noise = noise_fn(env_keys)
        sf, si, obs = kernel(sf, si, noise)
        return env_keys, sf, si, obs

    def set_reset_rows(si, value):
        for r in _RESET_ROWS:
            si = si.at[r].set(jnp.full((hp.num_envs,), value, I32))
        return si

    def reset_pulse(frozen, env_keys, sf, si, obs, key):
        si = set_reset_rows(si, 1)
        fa = frozen_forward(frozen, obs, key)
        si = write_actions(si, jnp.zeros((hp.num_envs, 6), I32), fa)
        env_keys, sf, si, obs = env_step(env_keys, sf, si)
        si = set_reset_rows(si, 0)
        return env_keys, sf, si, obs

    def rollout(agent, frozen, env_keys, sf, si, obs, stats, key):
        key, k0 = jax.random.split(key)
        env_keys, sf, si, obs = reset_pulse(frozen, env_keys, sf, si, obs,
                                            k0)
        obs0 = obs[ti_lo:ti_lo + C.OBS_SIZE].T

        def body(carry, _):
            env_keys, sf, si, obs_rows, obs_t, stats, key = carry
            key, k1, k2 = jax.random.split(key, 3)
            actions, logp, value = agent_lib.forward(net, agent, obs_t, k1)
            fa = frozen_forward(frozen, obs_rows, k2)
            si2 = write_actions(si, actions, fa)
            env_keys, sf2, si2, obs_rows2 = env_step(env_keys, sf, si2)
            obs_t2 = obs_rows2[ti_lo:ti_lo + C.OBS_SIZE].T
            rew = sf2[rew_row]
            done = sf2[done_row]
            stats = _stats_step(stats, rew, done)
            out = (obs_t, actions, value, logp, 1.0 - done, rew)
            if hp.record_world0:
                out = out + (_world0_rows(sf2, si2, done),)
            return (env_keys, sf2, si2, obs_rows2, obs_t2, stats, key), out

        (env_keys, sf, si, obs, obs_t, stats, key), traj = jax.lax.scan(
            body, (env_keys, sf, si, obs, obs0, stats, key), None, length=T)
        if hp.record_world0:
            obs_b, act_b, val_b, logp_b, nd_b, rew_b, w0 = traj
        else:
            obs_b, act_b, val_b, logp_b, nd_b, rew_b = traj
            w0 = None
        next_value = agent_lib.evaluate(net, agent, obs_t)
        buf = dict(obs=obs_b, actions=act_b, values=val_b, log_probs=logp_b,
                   not_dones=nd_b, rewards=rew_b, next_value=next_value)
        return env_keys, sf, si, obs, stats, key, buf, w0

    if rollout_kernel:
        from ..ops import fused_rollout as FR
        n_shards = 1 if mesh is None else mesh.size
        # Interpret mode (CPU dryrun) has no pltpu PRNG lowering; feed the
        # same per-tick noise through the kernel's external-noise input
        # instead (same program structure and shardings).
        # On the single-shard path the rollout kernel also accumulates
        # the obs-normalizer moments in place (the obs tiles are already
        # in VMEM); under a plain mesh the per-shard moments would need
        # an extra combine, so the gather-based sharded fused-GAE path
        # keeps the separate one-pass moments kernel.  The dp_update
        # path DOES the cross-shard Chan combine (it never gathers the
        # trajectory), so it re-enables the in-rollout moments.
        rk_obs_moments = fused_gae and not rollout_tiled and \
            (mesh is None or dp_update)
        # rollout_block overrides the default 1024-lane cap (the VMEM-
        # safe default); larger blocks mean fewer grid steps per launch
        # — see bench_rollout_blk.py for the measured sweep.
        if rollout_tiled:
            # Fully-tiled variant (docs/rollout_kernel_tiling.md, v3):
            # the whole tick — sim AND policy — on (8, blk/8) field
            # tiles, each Dense layer one rank-3 dot_general, zero
            # relayout; measured slower than the 1-D default, kept
            # behind the flag for A/B.  No in-rollout obs moments (the
            # fused-GAE path then uses the separate moments kernel).
            rk = FR.make_fused_rollout_tiled(
                cfg, worlds_per_shard, T, trainee_idx=ti,
                use_frozen=hp.use_frozen,
                block=(rollout_block if rollout_block
                       else min(block, 1024)),
                interpret=rollout_interpret,
                external_noise=rollout_interpret)
        else:
            rk = FR.make_fused_rollout(
                cfg, worlds_per_shard, T,
                trainee_idx=ti, use_frozen=hp.use_frozen,
                block=(rollout_block if rollout_block
                       else min(block, 1024)),
                interpret=rollout_interpret,
                external_noise=rollout_interpret,
                obs_moments=rk_obs_moments,
                max_block=(rollout_block or 1024),
                traj_dtype=traj_dtype,
                policy_bf16=bf16_policy)
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map
            rs = P(None, "data")
            n_p = 5 * (2 if hp.use_frozen else 1)
            rng_spec = rs if rollout_interpret else P("data", None)
            out_sp = (rs, rs, rs, P(None, None, "data"))
            if rk_obs_moments:
                # per-shard (ROLL_OBS, 8) moment blocks stack along the
                # data axis; the caller Chan-combines them (dp_update)
                out_sp = out_sp + (P("data", None),)
            rk = shard_map(
                rk, mesh=mesh,
                in_specs=(rng_spec, rs, rs, rs) + (P(),) * n_p,
                out_specs=out_sp,
                check_vma=False)

        def make_rng_arg(ks):
            if not rollout_interpret:
                # Per-shard independent seeds: the kernel folds only its
                # local block index into the PRNG, so identical seeds
                # across shards would replay identical noise.  Column 1
                # is the tick_base (0 in production — see
                # fused_rollout.TICK_STRIDE).
                seeds = jax.lax.bitcast_convert_type(
                    jax.random.bits(ks, (n_shards,), jnp.uint32), I32)
                return jnp.stack(
                    [seeds, jnp.zeros((n_shards,), I32)], axis=1)
            import numpy as _np
            u = jax.random.uniform(
                ks, (T * FR.EXT_NOISE_CHUNK, hp.num_envs))
            # rows 0..7 of each per-tick chunk are U(-1,1) shot/reset
            # deviations; everything else stays U(0,1).
            row = _np.arange(T * FR.EXT_NOISE_CHUNK) % FR.EXT_NOISE_CHUNK
            signed = jnp.asarray(row < 8)[:, None]
            return jnp.where(signed, 2.0 * u - 1.0, u)

        from ..models.normalize import (EPS as RMS_EPS, _rms_merge,
                                        rms_normalize, rms_update,
                                        rms_update_padded,
                                        rms_update_padded_moments,
                                        rms_update_padded_tdw)
        from ..ops.gae import compute_gae
        OBS = C.OBS_SIZE
        _, _update_policy = make_update_fns(hp, net)
        update_policy_feat = _update_policy.with_feat

        if fused_grads:
            # Hand-derived forward+backward Pallas kernel per minibatch
            # (ops/fused_update.py): feature-major on-chip, activations
            # never leave VMEM, and the epoch shuffle is FREE — the block
            # permutation rides as a scalar-prefetch operand driving the
            # kernel's input index maps, so permuted blocks stream
            # straight out of the trajectory buffer (no materialized
            # epoch gather, no relayout).  Gradient-exact vs autodiff
            # (tests/test_fused_update.py).
            from ..ops import fused_update as FU
            wb = hp.update_block or \
                FU.pick_update_block(hp.num_envs, hp.minibatch_size)
            if hp.num_envs % wb or hp.minibatch_size % wb:
                raise ValueError(
                    f"update_block={wb} must divide both num_envs="
                    f"{hp.num_envs} and minibatch_size="
                    f"{hp.minibatch_size}")
            n_blocks = T * (hp.num_envs // wb)
            n_updates = hp.update_epochs * hp.num_minibatches
            # Data-parallel note: only the ROLLOUT is shard_mapped; this
            # update phase runs at the global level, so under a mesh
            # GSPMD gathers the sharded trajectory and every device
            # executes the identical full update (a Mosaic call has no
            # partitioning rule).  Deliberate for this model: the
            # learner is ~5k params and the whole-update compute is
            # ~2 ms, so replicating it costs less than sharding it and
            # psum-ing 16 gradients/iter, and it keeps parameters
            # bit-identical across devices with no broadcast step.  The
            # gather is the rollout output that the update must read
            # anyway (~128 MB at 8192 envs); at >=65k envs per SLICE,
            # prefer more data-parallel shards over bigger per-shard
            # worlds.  Parity asserted in __graft_entry__.dryrun and
            # tests/test_parallel.py.
            if not dp_update:
                ufp = FU.make_fused_update_phase(
                    hp, FR.ROLL_OBS, T, hp.num_envs, wb,
                    interpret=rollout_interpret,
                    raw_side=fused_gae,
                    traj_dtype=traj_dtype)
            if fused_gae:
                # GAE + side-array assembly as one Pallas pass; the
                # side rows stay RAW and the update kernel normalizes
                # them in place from four scalars (ops/fused_gae.py).
                # The obs-normalizer moments reduce in one HBM pass
                # over the trajectory too (make_obs_moments).
                from ..ops import fused_gae as FG
                gae_kernel = FG.make_fused_gae(
                    T, worlds_per_shard if dp_update else hp.num_envs,
                    hp.gamma, hp.gae_lambda,
                    FR.R_VALUE, FR.R_REW, FR.R_DONE,
                    interpret=rollout_interpret,
                    traj_dtype=traj_dtype)
                gae_gb = gae_kernel.gb
                obs_mom_kernel = None if rk_obs_moments else \
                    FG.make_obs_moments(T, hp.num_envs, FR.ROLL_OBS,
                                        interpret=rollout_interpret,
                                        traj_dtype=traj_dtype)
                if dp_update:
                    # GAE is per-world independent: run the kernel on
                    # each shard's worlds; block-moment/stat rows stack
                    # along the data axis (one more block batch for the
                    # same closed-form Chan combines).  The trajectory
                    # never leaves its shard.
                    from jax.sharding import PartitionSpec as P
                    from jax import shard_map
                    gae_kernel = shard_map(
                        gae_kernel, mesh=mesh,
                        in_specs=(P(None, None, "data"),
                                  P(None, "data"), P(None, "data"),
                                  P()),
                        out_specs=(P(None, None, "data"),
                                   P("data", None), P(None, "data"),
                                   P("data", None, None)),
                        check_vma=False)

            if dp_update:
                import dataclasses as _dc

                import optax
                from jax.sharding import PartitionSpec as P
                from jax import shard_map

                n_sh = mesh.size
                W_l = worlds_per_shard
                hp_l = _dc.replace(hp, num_envs=W_l)
                wb_l = hp.update_block or \
                    FU.pick_update_block(W_l, hp_l.minibatch_size)
                if W_l % wb_l or hp_l.minibatch_size % wb_l:
                    raise ValueError(
                        f"dp_update: update_block={wb_l} must divide "
                        f"both worlds/shard={W_l} and the local "
                        f"minibatch={hp_l.minibatch_size}")
                mbg = FU.make_fused_minibatch_grad_prefetch(
                    hp_l, FR.ROLL_OBS, T, W_l, wb_l,
                    interpret=rollout_interpret, traj_dtype=traj_dtype)
                nblk_l = T * (W_l // wb_l)
                bpm_l = hp_l.minibatch_size // wb_l
                n_updates = hp.update_epochs * hp.num_minibatches
                inv_sh = 1.0 / n_sh

                def _dp_body(perms_l, traj_l, side_l, nrm, ustats,
                             params, opt_state):
                    # raw-side normalization once in XLA (the phase
                    # kernel does this per block; here the side array
                    # is tiny next to the trajectory)
                    us = ustats[0]
                    v_n = jnp.clip(
                        (side_l[:, FU.SIDE_VALUE] - us[0]) * us[1],
                        -5.0, 5.0)
                    a_n = (side_l[:, FU.SIDE_ADV] - us[2]) * us[3]
                    r_n = jnp.clip(
                        (side_l[:, FU.SIDE_RET] - us[0]) * us[1],
                        -5.0, 5.0)
                    side_n = jnp.concatenate(
                        [jnp.stack([v_n, a_n, r_n], axis=1),
                         jnp.zeros((T, FU.SIDE_ROWS - 3, W_l), F32)],
                        axis=1)
                    idx_rows = perms_l[0].reshape(n_updates, bpm_l)

                    def mb_body(carry, idx):
                        params, opt = carry
                        # local-mean gradient over this shard's slice
                        # of the minibatch; psum/n -> the exact global
                        # minibatch mean (equal shard slices)
                        g4 = mbg(idx, traj_l, side_n, nrm,
                                 *FU.pack_weights(params, FR.ROLL_OBS))
                        g4 = [jax.lax.psum(g, "data") * inv_sh
                              for g in g4]
                        grads = FU.grads_to_tree(params, *g4,
                                                 FR.ROLL_OBS)
                        updates, opt = tx.update(grads, opt, params)
                        params = optax.apply_updates(params, updates)
                        return (params, opt), None

                    (params, opt_state), _ = jax.lax.scan(
                        mb_body, (params, opt_state), idx_rows)
                    return params, opt_state

                _dp_phase = shard_map(
                    _dp_body, mesh=mesh,
                    in_specs=(P("data", None), P(None, None, "data"),
                              P(None, None, "data"), P(), P(), P(),
                              P()),
                    out_specs=(P(), P()),
                    check_vma=False)

                def update_policy_dp(agent, opt_state, traj, side, key,
                                     ustats):
                    """Data-parallel update phase: each shard streams
                    its LOCAL trajectory blocks through the
                    scalar-prefetch gradient kernel; the ~28 KB packed
                    gradient psums per minibatch and clip+Adam (real
                    optax) runs replicated.  The epoch shuffle is
                    STRATIFIED: each shard permutes its own blocks, so
                    every minibatch draws equally from every shard and
                    no sample crosses a shard (PARITY.md deviation;
                    reference shuffle: scripts/ppo.py:188).  With one
                    shard the permutation stream and semantics match
                    the flagship phase kernel (pinned in
                    tests/test_parallel.py)."""
                    nrm = FU.pack_norm(agent.obs_rms, FR.ROLL_OBS)
                    perms = jnp.argsort(
                        jax.random.bits(
                            key, (n_sh, hp.update_epochs, nblk_l),
                            jnp.uint32),
                        axis=-1).astype(I32).reshape(n_sh, -1)
                    params, opt_state = _dp_phase(
                        perms, traj, side, nrm, ustats, agent.params,
                        opt_state)
                    return agent.replace(params=params), opt_state

            def update_policy_traj(agent, opt_state, traj, side, key,
                                   ustats=None):
                nrm = FU.pack_norm(agent.obs_rms, FR.ROLL_OBS)
                # One batched sort yields every epoch's block permutation
                # (argsort of iid draws == uniform permutation); uint32
                # bits avoid the f32-uniform key-collision bias.
                perms = jnp.argsort(
                    jax.random.bits(key, (hp.update_epochs, n_blocks),
                                    jnp.uint32),
                    axis=1).astype(I32).reshape(-1)
                clip_state, (adam, scale_state) = opt_state
                extra = (ustats,) if fused_gae else ()
                out = ufp(perms, adam.count, traj, side, nrm, *extra,
                          *FU.pack_weights(agent.params, FR.ROLL_OBS),
                          *FU.pack_weights(adam.mu, FR.ROLL_OBS),
                          *FU.pack_weights(adam.nu, FR.ROLL_OBS))
                params = FU.unpack_weights(agent.params, *out[0:4],
                                           FR.ROLL_OBS)
                adam = adam._replace(
                    count=adam.count + n_updates,
                    mu=FU.unpack_weights(adam.mu, *out[4:8], FR.ROLL_OBS),
                    nu=FU.unpack_weights(adam.nu, *out[8:12],
                                         FR.ROLL_OBS))
                return (agent.replace(params=params),
                        (clip_state, (adam, scale_state)))

        @jax.jit
        def train_iteration_kernel(ts: FusedTrainState):
            key, k0, ks, k_upd = jax.random.split(ts.key, 4)
            env_keys, sf, si, obs = reset_pulse(ts.frozen, ts.env_keys,
                                                ts.sf, ts.si, ts.obs, k0)
            mats = FR.pack_policy(ts.agent)
            if hp.use_frozen:
                mats = mats + FR.pack_policy(ts.frozen)
            rk_out = rk(make_rng_arg(ks), sf, si, obs, *mats)
            if rk_obs_moments:
                sf, si, obs, traj, rk_om = rk_out
            else:
                sf, si, obs, traj = rk_out

            next_value = agent_lib.evaluate(net, ts.agent,
                                            obs[ti_lo:ti_lo + OBS].T)
            if not fused_gae:
                values = traj[:, FR.R_VALUE, :]
                rewards = traj[:, FR.R_REW, :]
                done = traj[:, FR.R_DONE, :]
                not_dones = 1.0 - done
                stats, _ = jax.lax.scan(
                    lambda st, rd: (_stats_step(st, rd[0], rd[1]), None),
                    ts.stats, (rewards, done))

            # ---- advantages on (T, W) trajectory rows, then the
            # update-phase columns are written back into the trajectory's
            # spare rows so ONE relayout yields the minibatch feat matrix
            # (no concatenation, no per-field transposes).  Semantics
            # identical to make_update_fns.compute_advantages
            # (scripts/ppo.py:144-177). ----
            agent = ts.agent
            if fused_gae:
                # One Pallas pass replaces unnorm + the 32-step GAE scan
                # + both rms_update reductions + adv mean/std + both
                # rms_normalize passes + the side-array concat: the
                # kernel writes the RAW side array and per-block
                # two-pass moments; the normalizer/advantage statistics
                # are closed-form Chan merges of those moments, and the
                # update kernel normalizes the side rows in place from
                # four prefetched scalars.  Semantics identical to the
                # unfused path (tests/test_fused_gae.py).
                from ..ops import fused_gae as FG
                vrm = agent.value_rms
                vstats = jnp.concatenate([
                    vrm.mean[0].reshape(1, 1),
                    jnp.sqrt(vrm.var[0] + RMS_EPS).reshape(1, 1),
                    jnp.zeros((1, FG.VSTAT_COLS - 2), F32)],
                    axis=1).astype(F32)
                carry = jnp.stack([ts.stats.curr_rewards,
                                   ts.stats.episode_lengths])
                side, moments, carry_out, ticks = gae_kernel(
                    traj, carry, next_value[None, :], vstats)
                # windowed meters: per-tick sums arrive pre-reduced per
                # block; the sequential recursion runs on scalars only
                per_t = jnp.sum(ticks, axis=0)              # (T, 8)

                def meter_body(st, row):
                    r_mean, r_size = _meter_update(
                        st[0], st[1], row[1], row[0])
                    l_mean, l_size = _meter_update(
                        st[2], st[3], row[2], row[0])
                    return (r_mean, r_size, l_mean, l_size), None

                (r_mean, r_size, l_mean, l_size), _ = jax.lax.scan(
                    meter_body,
                    (ts.stats.mean_reward, ts.stats.reward_size,
                     ts.stats.mean_length, ts.stats.length_size),
                    per_t)
                stats = EpisodeStats(
                    curr_rewards=carry_out[0],
                    episode_lengths=carry_out[1],
                    mean_reward=r_mean, reward_size=r_size,
                    mean_length=l_mean, length_size=l_size)
                n_per = float(T * gae_gb)
                vm_b, vv_b, nN = FG.combine_block_moments(
                    moments[:, 0], moments[:, 1], n_per)
                am_b, av_b, _ = FG.combine_block_moments(
                    moments[:, 2], moments[:, 3], n_per)
                rm_b, rv_b, _ = FG.combine_block_moments(
                    moments[:, 4], moments[:, 5], n_per)
                value_rms = _rms_merge(vrm, vm_b.reshape(1),
                                       vv_b.reshape(1), nN)
                value_rms = _rms_merge(value_rms, rm_b.reshape(1),
                                       rv_b.reshape(1), nN)
                sigma = jnp.sqrt(av_b)
                ar = 1.0 / (sigma + 1e-8)
                vr_post = jax.lax.rsqrt(value_rms.var[0] + RMS_EPS)
                ustats = jnp.concatenate([
                    value_rms.mean[0].reshape(1, 1),
                    vr_post.reshape(1, 1), am_b.reshape(1, 1),
                    ar.reshape(1, 1), jnp.zeros((1, 4), F32)],
                    axis=1).astype(F32)
                om = rk_om if rk_obs_moments else obs_mom_kernel(traj)
                if dp_update:
                    # per-shard moment blocks stacked (n_sh*ROLL_OBS, 8)
                    # -> one Chan combine across shards per feature
                    m = om.reshape(mesh.size, FR.ROLL_OBS, 8)
                    means, m2s, ns = m[:, :, 0], m[:, :, 1], m[:, :, 2]
                    gmean = means.mean(axis=0)
                    gm2 = m2s.sum(axis=0) + \
                        (ns * (means - gmean[None]) ** 2).sum(axis=0)
                    obs_rms = rms_update_padded_moments(
                        agent.obs_rms, gmean, gm2, ns.sum(axis=0)[0])
                else:
                    obs_rms = rms_update_padded_moments(
                        agent.obs_rms, om[:, 0], om[:, 1], om[0, 2])
                agent = agent.replace(obs_rms=obs_rms,
                                      value_rms=value_rms)
                if dp_update:
                    agent, opt_state = update_policy_dp(
                        agent, ts.opt_state, traj, side, k_upd, ustats)
                else:
                    agent, opt_state = update_policy_traj(
                        agent, ts.opt_state, traj, side, k_upd, ustats)
                adv_n = (side[:, FU.SIDE_ADV, :] - am_b) * ar
                values_n = jnp.clip(
                    (side[:, FU.SIDE_VALUE, :] - value_rms.mean[0]) *
                    vr_post, -5.0, 5.0)
                metrics = {
                    "mean_reward": stats.mean_reward,
                    "mean_episode_length": stats.mean_length,
                    "reward_window": stats.reward_size,
                    "adv_abs_mean": jnp.abs(adv_n).mean(),
                    "value_mean": values_n.mean(),
                }
                ts = ts.replace(agent=agent, opt_state=opt_state,
                                sf=sf, si=si, obs=obs,
                                env_keys=env_keys, stats=stats, key=key,
                                iteration=ts.iteration + 1)
                return ts, metrics

            values_un = agent_lib.unnorm_value(agent, values)
            next_un = agent_lib.unnorm_value(agent, next_value)
            advantages, returns = compute_gae(rewards, values_un,
                                              not_dones, next_un,
                                              hp.gamma, hp.gae_lambda)
            value_rms = rms_update(agent.value_rms,
                                   values_un.reshape(-1, 1))
            value_rms = rms_update(value_rms, returns.reshape(-1, 1))
            mu = advantages.mean()
            sigma = advantages.std(ddof=1)
            adv_n = (advantages - mu) / (sigma + 1e-8)
            values_n = rms_normalize(value_rms, values_un.reshape(-1, 1),
                                     clamp=5.0).reshape(values.shape)
            returns_n = rms_normalize(value_rms, returns.reshape(-1, 1),
                                      clamp=5.0).reshape(returns.shape)

            if fused_grads:
                # The trajectory buffer is consumed IN PLACE by the
                # scalar-prefetch gradient kernel: no row write-backs, no
                # (T, rows, W) -> (T*W, rows) relayout, no epoch gathers.
                # The GAE/update quantities ride in a small side array
                # with the same (T, rows, W) block geometry, and the
                # obs-rms update reduces the feature-major obs rows
                # directly (rms_update_padded_tdw covers the
                # structural-zero tail analytically).
                side = jnp.concatenate([
                    jnp.stack([values_n, adv_n, returns_n], axis=1),
                    jnp.zeros((T, FU.SIDE_ROWS - 3, hp.num_envs), F32)],
                    axis=1)
                obs_rms = rms_update_padded_tdw(
                    agent.obs_rms, traj[:, :FR.ROLL_OBS, :])
                agent = agent.replace(obs_rms=obs_rms,
                                      value_rms=value_rms)
                agent, opt_state = update_policy_traj(
                    agent, ts.opt_state, traj, side, k_upd)
            else:
                # feat columns line up with run_epochs' CONTIGUOUS
                # contract: packed obs 0:ROLL_OBS, actions next (R_ACT),
                # then logp, value_n, advantage, return_n at
                # R_LOGP+1..+3.  +1/+2 are the pad rows before the
                # 8-aligned R_VALUE; +3 IS R_VALUE — its raw value is
                # dead once GAE has run on this path, so return_n may
                # overwrite it.  Rows after it (raw rew/done + tail)
                # are ignored padding.
                traj = traj.at[:, FR.R_LOGP + 1, :].set(values_n)
                traj = traj.at[:, FR.R_LOGP + 2, :].set(adv_n)
                traj = traj.at[:, FR.R_LOGP + 3, :].set(returns_n)
                feat = jnp.swapaxes(traj, 1, 2).reshape(
                    T * hp.num_envs, FR.ROLL_ROWS)
                obs_rms = rms_update_padded(agent.obs_rms,
                                            feat[:, :FR.ROLL_OBS])
                agent = agent.replace(obs_rms=obs_rms,
                                      value_rms=value_rms)
                agent, opt_state = update_policy_feat(
                    agent, ts.opt_state, feat, FR.ROLL_OBS, 6, k_upd)
            metrics = {
                "mean_reward": stats.mean_reward,
                "mean_episode_length": stats.mean_length,
                "reward_window": stats.reward_size,
                "adv_abs_mean": jnp.abs(adv_n).mean(),
                "value_mean": values_n.mean(),
            }
            ts = ts.replace(agent=agent, opt_state=opt_state, sf=sf, si=si,
                            obs=obs, env_keys=env_keys, stats=stats,
                            key=key, iteration=ts.iteration + 1)
            return ts, metrics

        return train_iteration_kernel

    # ---- advantages + update: the shared phase (ppo/train.py) ----
    compute_advantages, update_policy = make_update_fns(hp, net)

    @jax.jit
    def train_iteration(ts: FusedTrainState):
        key, k_roll, k_upd = jax.random.split(ts.key, 3)
        env_keys, sf, si, obs, stats, _k, buf, w0 = rollout(
            ts.agent, ts.frozen, ts.env_keys, ts.sf, ts.si, ts.obs,
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
        ts = ts.replace(agent=agent, opt_state=opt_state, sf=sf, si=si,
                        obs=obs, env_keys=env_keys, stats=stats, key=key,
                        iteration=ts.iteration + 1)
        return ts, metrics

    return train_iteration


def _world0_rows(sf, si, done):
    """World-0 npz telemetry assembled from rows (schema of
    ppo/train._world0_log)."""
    gf = lambda k: sf[layout.F_IDX[k], 0]  # noqa: E731
    gi = lambda k: si[layout.I_IDX[k], 0]  # noqa: E731
    agent_pos = jnp.stack([
        jnp.stack([gf(f"a{i}.pos_x"), gf(f"a{i}.pos_y"),
                   gf(f"a{i}.pos_z")]) for i in range(C.NUM_AGENTS)])
    orientation = jnp.stack([
        jnp.stack([gf(f"a{i}.quat_w"), gf(f"a{i}.quat_x"),
                   gf(f"a{i}.quat_y"), gf(f"a{i}.quat_z")])
        for i in range(C.NUM_AGENTS)])
    possession = jnp.stack([
        jnp.stack([gi(f"a{i}.has_ball"), gi(f"a{i}.held_ball"),
                   gi(f"a{i}.points_worth")]) for i in range(C.NUM_AGENTS)])
    actions = jnp.stack([
        jnp.stack([gi(f"a{i}.{n}") for n in
                   ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
                    "a_shoot")]) for i in range(C.NUM_AGENTS)])
    game_state = jnp.stack([
        gi("ginb").astype(F32), gi("glive").astype(F32), gf("period"),
        gf("tip"), gi("t0hoop").astype(F32), gf("t0score"),
        gi("t1hoop").astype(F32), gf("t1score"), gf("gclock"), gf("sclock"),
        gf("sbaskets"), gf("oob"), gf("iclock"), gi("is1v1").astype(F32)])
    return {
        "agent_pos": agent_pos[None],
        "ball_pos": jnp.stack([gf("bpos_x"), gf("bpos_y"),
                               gf("bpos_z")])[None, None],
        "ball_vel": jnp.stack([gf("bvel_x"), gf("bvel_y"),
                               gf("bvel_z")])[None, None],
        "orientation": orientation[None],
        "ball_physics": jnp.stack([
            gi("binflight"), gi("blt_agent"), gi("blt_team"),
            gi("bsb_agent"), gi("bsb_team"), gi("bspv"),
            gi("bsgi")])[None, None],
        "agent_possession": possession[None],
        "game_state": game_state[None],
        "rewards": jnp.stack([gf(f"a{i}.reward")
                              for i in range(C.NUM_AGENTS)])[None],
        "actions": actions[None],
        "done": done[0:1],
    }
