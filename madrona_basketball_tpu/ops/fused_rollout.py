"""Policy-in-the-loop rollout: T PPO steps as ONE Pallas kernel.

The reference's training rollout crosses the Python->C++ boundary and
launches the policy + the sim megakernel once per step
(scripts/ppo.py:65-139, scripts/env.py:125-170).  The round-1 TPU trainer
already fused that into a `lax.scan` (ppo/train_fused.py), but each tick
still pays one Pallas launch for the sim plus an XLA subgraph for the
policy, with the full fleet state round-tripping HBM every tick.

This kernel is the TPU-native answer to the reference megakernel for the
TRAINING shape: the whole fleet state stays VMEM-resident for all T ticks,
and each tick runs

    policy MLP (MXU) -> Gumbel-max action sampling -> action write ->
    all 19 game systems incl. fillObservations (VPU) -> trajectory row
    writes (obs/action/logp/value/reward/done)

with noise from the on-chip PRNG.  Actions change every tick and
observations are computed every tick — the honest PPO rollout workload,
not held-action stepping.  Per-tick trajectory blocks stream to HBM
through the output pipeline while the next tick computes.

The in-kernel policy is numerically the same function as
`models.agent.forward` (flax ActorCritic apply + `models.action.sample`):
obs RMS-normalize (clamp +-5, eps 1e-5) -> 2x(Dense 32 + LayerNorm
(eps 1e-6, fast variance) + ReLU) -> 19-logit actor + 1 value head ->
one Gumbel tensor + per-bucket argmax.  `pack_policy` lays the flax
parameter pytree out as five small matrices sized for VMEM broadcast.

Grid: (W / block, T) — world blocks outer, ticks inner.  State and obs
output blocks have t-invariant index maps, so Mosaic keeps them resident
in VMEM across the T inner steps and flushes once per world block (the
same revisiting contract the multi-step kernel relies on).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..config import SimConfig
from .fused_gae import chan_fold
from .fused_step import _bits_to_unit, _load_dicts, _noise_dict, \
    _store_rows, pick_block, step_fields
from .layout import (F_IDX, I_IDX, N_F32_ROWS, N_I32_ROWS, N_NOISE_ROWS,
                     N_OBS_ROWS)

F32 = jnp.float32
I32 = jnp.int32
A = C.NUM_AGENTS
N_LOGITS = sum(C.ACTION_BUCKETS)  # 19
OBS = C.OBS_SIZE                  # 128

# Trajectory row layout (per tick, per world).  Observations are stored
# PACKED: only the C.OBS_USED real slots ride in the trajectory — the
# obs tail is structural zero padding (src/game.cpp:1456-1460) that
# contributes nothing to the policy, and dropping it keeps the minibatch
# feat matrix at <= 128 columns (one f32 lane tile) instead of 144
# padded to 256, halving every update-phase gather/read.  Padded to a
# multiple of 8 sublanes so per-tick blocks tile cleanly.
ROLL_OBS = C.OBS_USED      # 103 packed obs rows
R_ACT = ROLL_OBS           # 6 action rows
R_LOGP = R_ACT + 6         # 109
# value/reward/done start at the next 8-row boundary (112) so all three
# share ONE aligned (T, 8, W) sublane window: the fused-GAE kernel
# (ops/fused_gae.py) streams a single window per block instead of two
# (Mosaic blocks must be 8-row aligned).  Rows R_LOGP+1..R_VALUE-1 are
# structural zero padding, reused by the materialized-gather update
# path as its contiguous value/adv/return feat columns.
R_VALUE = -(-(R_LOGP + 1) // 8) * 8  # 112
R_REW = R_VALUE + 1
R_DONE = R_REW + 1
# Padded to a full 128-lane tile: a (total, 128) feat matrix gathers
# measurably faster than (total, 120) (aligned minor dim), worth the 7%
# extra trajectory traffic.
ROLL_ROWS = 128

# External-noise chunk layout (test path): rows 0..8 sim noise (same
# semantics as layout.N_NOISE_ROWS), rows 16..34 trainee uniforms,
# rows 35..53 frozen uniforms, padded to 56 (dynamic sublane offsets must
# be divisible by 8).
EXT_TRAINEE_U = 16
EXT_FROZEN_U = EXT_TRAINEE_U + N_LOGITS
EXT_NOISE_CHUNK = ((EXT_FROZEN_U + N_LOGITS + 7) // 8) * 8  # 56

_ACTION_NAMES = ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
                 "a_shoot")
RMS_EPS = 1e-5  # models/normalize.py EPS
LN_EPS = 1e-6   # flax nn.LayerNorm default

# On-chip PRNG stream id: stream = block * TICK_STRIDE + tick_base + t.
# The stride (not n_steps) decouples the stream from the launch length,
# so a T-step launch and T single-step launches with tick_base = t draw
# IDENTICAL noise — the composition property the on-TPU equivalence pin
# exploits (scripts/bench-level check, BENCHMARKS.md).
TICK_STRIDE = 1 << 20


def pack_policy(ap) -> tuple:
    """AgentParams -> (nrm, w1t, w2t, wht, bias) VMEM-friendly matrices.

    nrm  (OBS, 2):  [:, 0] obs mean, [:, 1] rsqrt(obs var + 1e-5)
    w1t  (32, OBS), w2t (32, 32): pre-transposed Dense kernels
    wht  (N_LOGITS + 1, 32): actor head rows + value head row
    bias (32, 8): cols = b1, ln1.scale, ln1.bias, b2, ln2.scale, ln2.bias,
                  head bias (N_LOGITS + 1 entries, zero-padded), unused
    """
    pp = ap.params["params"]
    w1 = pp["Dense_0"]["kernel"]
    w2 = pp["Dense_1"]["kernel"]
    wa = pp["Dense_2"]["kernel"]
    wv = pp["Dense_3"]["kernel"]
    h = w1.shape[1]
    nrm = jnp.stack([ap.obs_rms.mean,
                     jax.lax.rsqrt(ap.obs_rms.var + RMS_EPS)],
                    axis=1).astype(F32)
    wht = jnp.concatenate([wa.T, wv.T], axis=0).astype(F32)
    head_b = jnp.concatenate([pp["Dense_2"]["bias"], pp["Dense_3"]["bias"]])
    head_b = jnp.pad(head_b, (0, h - head_b.shape[0]))
    bias = jnp.stack([
        pp["Dense_0"]["bias"], pp["LayerNorm_0"]["scale"],
        pp["LayerNorm_0"]["bias"], pp["Dense_1"]["bias"],
        pp["LayerNorm_1"]["scale"], pp["LayerNorm_1"]["bias"],
        head_b, jnp.zeros((h,), F32)], axis=1).astype(F32)
    return (nrm, w1.T.astype(F32), w2.T.astype(F32), wht, bias)


def _layer_norm(x, scale, b):
    """Feature axis 0; flax fast-variance form, eps 1e-6."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    mu2 = jnp.mean(x * x, axis=0, keepdims=True)
    var = jnp.maximum(mu2 - mu * mu, 0.0)
    return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + b


def policy_forward_rows(obs_block, nrm, w1t, w2t, wht, bias,
                        mm_dtype=F32):
    """(OBS, B) raw obs -> (logits (N_LOGITS, B), value (B,)).

    Same math as models.agent.forward's normalize + net.apply, expressed
    feature-major so the Dense layers hit the MXU as (32, OBS) @ (OBS, B).

    mm_dtype=bfloat16 casts each matmul's operands to bf16 (f32
    accumulation) — the MXU's native input width, skipping the
    multi-pass f32 emulation.  Normalize/LayerNorm/ReLU and every
    add stay f32.  A numerics deviation (logits move ~1e-3 relative),
    so it rides behind the trainer's bf16_policy flag and is gated on
    the round-5 convergence A/B, like shuffle_block (PARITY.md).
    """
    def dot(w, v):
        return jnp.dot(w.astype(mm_dtype), v.astype(mm_dtype),
                       preferred_element_type=F32)

    x = jnp.clip((obs_block - nrm[:, 0:1]) * nrm[:, 1:2], -5.0, 5.0)
    h = dot(w1t, x) + bias[:, 0:1]
    h = jnp.maximum(_layer_norm(h, bias[:, 1:2], bias[:, 2:3]), 0.0)
    h = dot(w2t, h) + bias[:, 3:4]
    h = jnp.maximum(_layer_norm(h, bias[:, 4:5], bias[:, 5:6]), 0.0)
    out = dot(wht, h) + bias[0:N_LOGITS + 1, 6:7]
    return out[0:N_LOGITS], out[N_LOGITS]


def policy_forward_tiled(obs_tile, nrm, w1t, w2t, wht, bias):
    """(OBS, 8, C) TILED raw obs -> (logits (N_LOGITS, 8, C),
    value (8, C)).

    Column-for-column the same math as policy_forward_rows: every
    Dense layer is ONE rank-3 lax.dot_general contracting the feature
    axis against the whole (..., 8, C) tile (Mosaic lowers it as a
    matmul batched over the sublane-group axis — measurably faster
    than 8 explicit per-group matmuls + an output stack), and the
    normalize / layer-norm / ReLU run on full tiles with all 8
    sublanes of every vreg live.  Zero relayout anywhere.  World w of
    the flat (OBS, W) layout sits at (sub, col) = (w // C, w % C),
    identical to the tiled sim fields'.

    NOTE: nrm[:, 0:1, None] (slice + newaxis in ONE indexing op)
    traces to a jnp gather, which Mosaic cannot lower — slice first,
    then expand_dims."""
    def col(v):                                  # (R, 1) -> (R, 1, 1)
        return jnp.expand_dims(v, -1)

    def dg(w, v):                                # (M, K) @ (K, 8, C)
        return jax.lax.dot_general(w, v, (((1,), (0,)), ((), ())),
                                   preferred_element_type=F32)

    x = jnp.clip((obs_tile - col(nrm[:, 0:1])) * col(nrm[:, 1:2]),
                 -5.0, 5.0)
    h = dg(w1t, x) + col(bias[:, 0:1])
    h = jnp.maximum(_layer_norm(h, col(bias[:, 1:2]),
                                col(bias[:, 2:3])), 0.0)
    h = dg(w2t, h) + col(bias[:, 3:4])
    h = jnp.maximum(_layer_norm(h, col(bias[:, 4:5]),
                                col(bias[:, 5:6])), 0.0)
    out = dg(wht, h) + col(bias[0:N_LOGITS + 1, 6:7])
    return out[0:N_LOGITS], out[N_LOGITS]


def gumbel_from_uniform(u):
    """u in [0, 1) -> standard Gumbel, guarding u == 0."""
    return -jnp.log(-jnp.log(jnp.maximum(u, 1e-20)))


def sample_rows(logits, gumbel):
    """Gumbel-max per bucket over (N_LOGITS, B) rows.

    Returns (actions: list of 6 (B,) i32, summed log-prob (B,)).  The
    strict-> comparison chain keeps the FIRST maximal index, matching
    jnp.argmax in models.action.sample.
    """
    noisy = logits + gumbel
    actions = []
    total_logp = None
    off = 0
    for n in C.ACTION_BUCKETS:
        best_noisy = noisy[off]
        sel_logit = logits[off]
        best_idx = jnp.zeros_like(logits[off], I32)
        m = logits[off]
        for r in range(1, n):
            better = noisy[off + r] > best_noisy
            best_noisy = jnp.where(better, noisy[off + r], best_noisy)
            best_idx = jnp.where(better, r, best_idx)
            sel_logit = jnp.where(better, logits[off + r], sel_logit)
            m = jnp.maximum(m, logits[off + r])
        sumexp = jnp.zeros_like(m)
        for r in range(n):
            sumexp = sumexp + jnp.exp(logits[off + r] - m)
        lp = sel_logit - m - jnp.log(sumexp)
        total_logp = lp if total_logp is None else total_logp + lp
        actions.append(best_idx)
        off += n
    return actions, total_logp


def make_fused_rollout(cfg: SimConfig, num_worlds: int, n_steps: int,
                       trainee_idx: int, use_frozen: bool,
                       block: int = 1024, interpret: bool = False,
                       external_noise: bool = False,
                       obs_moments: bool = False,
                       max_block: int = 1024,
                       traj_dtype=F32,
                       policy_bf16: bool = False,
                       probe: str | None = None):
    """Build the T-step policy-in-the-loop rollout kernel.

    Returns
        rollout(rng, sf, si, obs0, *trainee_mats[, *frozen_mats])
            -> (sf', si', obs', traj)
    where traj is (n_steps, ROLL_ROWS, W): rows 0..ROLL_OBS-1 the packed
    (used-slots-only) obs the policy saw, then 6 sampled-action rows, the
    summed log-prob, the value (normalized space), and reward + done
    AFTER the tick — the per-step tuple ppo/train_fused.py's scan body
    emits, feature-major.

    `rng` is a (1, 2) int32 [seed, tick_base]; each (block, tick) grid
    step reseeds the on-chip PRNG with (seed, block * TICK_STRIDE +
    tick_base + t) so draws are independent, launch-deterministic, and
    COMPOSABLE: a T-step launch equals T single-step launches run with
    tick_base = 0..T-1 (production passes tick_base = 0).  With
    external_noise=True, `rng` is instead a (n_steps * EXT_NOISE_CHUNK, W)
    matrix of per-tick sim noise + policy uniforms (see
    pack_rollout_noise) — the test path proving kernel == XLA rollout on
    identical draws.

    The initial obs0 must be the observation produced by the step before
    the rollout starts (the reset pulse), matching scripts/ppo.py:64-67.

    `traj_dtype=jnp.bfloat16` stores the trajectory rows bf16 (all
    in-kernel math stays f32; rows round-to-nearest-even on store),
    halving the trajectory's HBM write traffic here and its read
    traffic in every downstream kernel (the update phase re-reads it
    update_epochs times — the iteration's dominant HBM term,
    BENCHMARKS.md round 5).  Sim state / obs outputs stay f32.  bf16
    Mosaic stores need 16-row sublane alignment, so rows are written
    as two aligned groups ([0:R_VALUE] pre-tick, [R_VALUE:ROLL_ROWS]
    post-tick) instead of per-row.

    `policy_bf16` runs the in-kernel policy matmuls with bf16 operands
    (f32 accumulation) — see policy_forward_rows.

    `probe` builds a TIMING-ONLY variant for the attribution bench
    (bench_rollout_attr.py): "sim_only" skips the policy forward +
    sampling (trajectory rows that would carry them are zero),
    "policy_only" skips the sim tick (state frozen, rew/done zero),
    "no_prng" replaces the on-chip PRNG draws with constants, and
    "no_traj" keeps all compute but gives the trajectory a t-invariant
    single-tick output block (flushed once per world block, killing
    ~31/32 of the HBM write traffic).  Probes deliberately break the
    training semantics; nothing in the production path may pass one.
    """
    assert n_steps >= 1
    assert probe in (None, "sim_only", "policy_only", "no_prng",
                     "no_traj")
    if traj_dtype != F32:
        assert traj_dtype == jnp.bfloat16
        assert R_VALUE % 16 == 0 and ROLL_ROWS % 16 == 0
    # Default 1024-lane cap keeps VMEM comfortable (387 state rows +
    # a double-buffered 128-row trajectory window ~= 2.6 MB/KiB-block);
    # raise max_block to sweep larger blocks (fewer grid steps, more
    # VMEM — ~11 MB at 4096, still under the 16 MB/core budget).
    blk = pick_block(num_worlds, block, max_block=max_block)
    grid = (num_worlds // blk, n_steps)
    ti_lo = trainee_idx * OBS
    fi_lo = (1 - trainee_idx) * OBS
    t_rows = [I_IDX[f"a{trainee_idx}.{n}"] for n in _ACTION_NAMES]
    f_rows = [I_IDX[f"a{1 - trainee_idx}.{n}"] for n in _ACTION_NAMES]
    rew_row = F_IDX[f"a{trainee_idx}.reward"]
    done_row = F_IDX[f"a{trainee_idx}.done"]

    n_param = 5 * (2 if use_frozen else 1)

    def kernel(*refs):
        rng_ref = refs[0]
        sf_in, si_in, obs0_in = refs[1:4]
        tp = tuple(r[...] for r in refs[4:9])
        fp = tuple(r[...] for r in refs[9:14]) if use_frozen else None
        outs = refs[4 + n_param:]
        if obs_moments:
            sf_out, si_out, obs_out, traj, mom_o = outs
        else:
            sf_out, si_out, obs_out, traj = outs
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            sf_out[...] = sf_in[...]
            si_out[...] = si_in[...]
            obs_out[...] = obs0_in[...]

        if probe == "no_prng" and not external_noise:
            sim_noise = [jnp.zeros((blk,), F32)
                         for _ in range(N_NOISE_ROWS)]
            u_t = jnp.full((N_LOGITS, blk), 0.5, F32)
            u_f = jnp.full((N_LOGITS, blk), 0.5, F32)
        elif external_noise:
            chunk = rng_ref[...]  # (EXT_NOISE_CHUNK, blk)
            sim_noise = [chunk[r] for r in range(N_NOISE_ROWS)]
            u_t = chunk[EXT_TRAINEE_U:EXT_TRAINEE_U + N_LOGITS]
            u_f = chunk[EXT_FROZEN_U:EXT_FROZEN_U + N_LOGITS]
        else:
            # prng_seed accepts at most 2 operands; fold (block, tick)
            # into one distinct stream value per grid step (TICK_STRIDE
            # keeps streams independent of the launch length so T-step
            # and 1-step launches compose).
            pltpu.prng_seed(rng_ref[0, 0],
                            b * TICK_STRIDE + rng_ref[0, 1] + t)
            n_draw = N_NOISE_ROWS + 2 * N_LOGITS
            u = _bits_to_unit(pltpu.bitcast(
                pltpu.prng_random_bits((n_draw, blk)), jnp.uint32))
            sim_noise = [2.0 * u[r] - 1.0
                         for r in range(N_NOISE_ROWS - 1)]
            sim_noise.append(u[N_NOISE_ROWS - 1])
            u_t = u[N_NOISE_ROWS:N_NOISE_ROWS + N_LOGITS]
            u_f = u[N_NOISE_ROWS + N_LOGITS:]

        # ---- policy forward + sampling on the PRE-TICK observation ----
        obs_t = obs_out[ti_lo:ti_lo + OBS, :]
        pol_dt = jnp.bfloat16 if policy_bf16 else F32
        if probe == "sim_only":
            actions = [jnp.zeros((blk,), I32) for _ in range(6)]
            logp = jnp.zeros((blk,), F32)
            value = jnp.zeros((blk,), F32)
        else:
            logits, value = policy_forward_rows(obs_t, *tp,
                                                mm_dtype=pol_dt)
            actions, logp = sample_rows(logits, gumbel_from_uniform(u_t))
            for j in range(6):
                si_out[t_rows[j]] = actions[j]
            if use_frozen:
                f_logits, _ = policy_forward_rows(
                    obs_out[fi_lo:fi_lo + OBS, :], *fp, mm_dtype=pol_dt)
                f_actions, _ = sample_rows(f_logits,
                                           gumbel_from_uniform(u_f))
                for j in range(6):
                    si_out[f_rows[j]] = f_actions[j]

        if obs_moments:
            # fold this tile's per-feature (mean, M2) into the running
            # obs-normalizer moments (Chan incremental merge) while the
            # obs rows are still in VMEM — replaces the post-rollout
            # full-trajectory reduction (ops/fused_gae.make_obs_moments)
            # on the single-shard path.  Under bf16 storage the moments
            # fold the PRE-quantization f32 obs (the values the policy
            # actually saw); the update kernel then normalizes the
            # quantized obs with these stats — a sub-bf16-ulp skew.
            chan_fold(mom_o, obs_t[0:ROLL_OBS], float(blk),
                      (b == 0) & (t == 0))
        if probe == "no_traj":
            # t-invariant single-tick block: one zero-fill per world
            # block, flushed once — kills the per-tick write stream.
            @pl.when(t == 0)
            def _():
                traj[...] = jnp.zeros_like(traj)
        elif traj_dtype != F32:
            # 16-row-aligned group store: bf16 sublane tiles are 16
            # rows, so per-row stores would be sub-tile writes.
            pre = jnp.concatenate(
                [obs_t[0:ROLL_OBS]] +
                [actions[j].astype(F32)[None] for j in range(6)] +
                [logp[None],
                 jnp.zeros((R_VALUE - R_LOGP - 1, blk), F32)], axis=0)
            traj[0, 0:R_VALUE, :] = pre.astype(traj_dtype)
        else:
            traj[0, 0:ROLL_OBS, :] = obs_t[0:ROLL_OBS]
            for j in range(6):
                traj[0, R_ACT + j] = actions[j].astype(F32)
            traj[0, R_LOGP] = logp
            traj[0, R_VALUE] = value
            for r in (*range(R_LOGP + 1, R_VALUE),
                      *range(R_DONE + 1, ROLL_ROWS)):
                traj[0, r] = jnp.zeros((blk,), F32)

        # ---- sim tick (all 19 systems, obs computed) ----
        if probe == "policy_only":
            rew = jnp.zeros((blk,), F32)
            done = jnp.zeros((blk,), F32)
        else:
            sf = [sf_out[r] for r in range(N_F32_ROWS)]
            si = [si_out[r] for r in range(N_I32_ROWS)]
            ag, ball, game, hoops = _load_dicts(sf, si)
            ag, ball, game, hoops, obs = step_fields(
                cfg, ag, ball, game, hoops, _noise_dict(sim_noise),
                compute_obs=True)
            sf2, si2 = _store_rows(ag, ball, game, hoops)
            for r in range(N_F32_ROWS):
                sf_out[r] = sf2[r]
            for r in range(N_I32_ROWS):
                si_out[r] = si2[r]
            for r in range(N_OBS_ROWS):
                obs_out[r] = obs[r]
            rew = sf2[rew_row]
            done = sf2[done_row]
        if probe == "no_traj":
            pass
        elif traj_dtype != F32:
            post = jnp.concatenate(
                [value[None], rew[None], done[None],
                 jnp.zeros((ROLL_ROWS - R_DONE - 1, blk), F32)], axis=0)
            traj[0, R_VALUE:ROLL_ROWS, :] = post.astype(traj_dtype)
        else:
            traj[0, R_REW] = rew
            traj[0, R_DONE] = done

    def state_spec(rows):
        return pl.BlockSpec((rows, blk), lambda b, t: (0, b),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)

    rng_spec = (pl.BlockSpec((EXT_NOISE_CHUNK, blk), lambda b, t: (t, b),
                             memory_space=pltpu.VMEM)
                if external_noise
                else pl.BlockSpec(memory_space=pltpu.SMEM))
    h = 32
    policy_specs = [const_spec((OBS, 2)), const_spec((h, OBS)),
                    const_spec((h, h)), const_spec((N_LOGITS + 1, h)),
                    const_spec((h, 8))]
    in_specs = ([rng_spec, state_spec(N_F32_ROWS), state_spec(N_I32_ROWS),
                 state_spec(N_OBS_ROWS)] +
                policy_specs * (2 if use_frozen else 1))
    traj_steps = 1 if probe == "no_traj" else n_steps
    traj_map = (lambda b, t: (0, 0, b)) if probe == "no_traj" else \
        (lambda b, t: (t, 0, b))
    out_specs = [state_spec(N_F32_ROWS), state_spec(N_I32_ROWS),
                 state_spec(N_OBS_ROWS),
                 pl.BlockSpec((1, ROLL_ROWS, blk), traj_map,
                              memory_space=pltpu.VMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((N_F32_ROWS, num_worlds), F32),
        jax.ShapeDtypeStruct((N_I32_ROWS, num_worlds), I32),
        jax.ShapeDtypeStruct((N_OBS_ROWS, num_worlds), F32),
        jax.ShapeDtypeStruct((traj_steps, ROLL_ROWS, num_worlds),
                             traj_dtype),
    ]
    if obs_moments:
        out_specs.append(const_spec((ROLL_OBS, 8)))
        out_shape.append(jax.ShapeDtypeStruct((ROLL_OBS, 8), F32))

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    def rollout(rng, sf, si, obs0, *policy_mats):
        assert len(policy_mats) == n_param
        return call(rng, sf, si, obs0, *policy_mats)

    return rollout


def make_fused_rollout_tiled(cfg: SimConfig, num_worlds: int, n_steps: int,
                             trainee_idx: int, use_frozen: bool,
                             block: int = 1024, interpret: bool = False,
                             external_noise: bool = False):
    """FULLY-TILED variant of the rollout kernel
    (docs/rollout_kernel_tiling.md, second design).

    The 1-D kernel runs its sim + noise + sampling segments on
    (rows, blk) world rows — 1 of 8 sublanes per f32 vreg.  Here every
    state field AND the whole tick is an (8, blk_c) tile (the multistep
    kernel's layout, ~5x on chained VPU math), with world w at
    (sub, col) = (w // cols, w % cols), cols = W / 8 — a FREE reshape
    at the XLA buffer level, so the flat outputs are world-indexed
    identically to the 1-D kernel's.

    There is NO layout boundary inside the tick: the obs normalize and
    the Gumbel-max sampling chains run on tiled tensors, and each Dense
    layer is ONE rank-3 dot_general contracting the feature axis against
    the whole (..., 8, C) tile (policy_forward_tiled — measurably faster
    than 8 explicit per-sublane-group matmuls + an output stack), its
    output already in tile position.  The first prototype instead relaid
    ~270 rows per tick through a VMEM scratch to keep the policy segment
    1-D; that relayout measured +0.32 ms per iteration at 8192x32 and
    ate the sim-segment win (BENCHMARKS.md round 4).

    Semantics match make_fused_rollout on identical external noise
    (tests/test_rollout_kernel.py); the on-chip PRNG path draws a
    DIFFERENT (equally distributed) stream — within the SURVEY §2.3
    distribution-parity contract.  No obs_moments support (the
    fused-GAE path then uses the separate one-pass moments kernel).
    """
    assert n_steps >= 1
    assert num_worlds % 1024 == 0, \
        "tiled rollout needs num_worlds % 1024 == 0 (cols % 128 == 0)"
    cols = num_worlds // 8
    blk_c = pick_block(cols, max(block // 8, 128), max_block=512)
    blk = 8 * blk_c
    grid = (cols // blk_c, n_steps)
    ti_lo = trainee_idx * OBS
    fi_lo = (1 - trainee_idx) * OBS
    t_rows = [I_IDX[f"a{trainee_idx}.{n}"] for n in _ACTION_NAMES]
    f_rows = [I_IDX[f"a{1 - trainee_idx}.{n}"] for n in _ACTION_NAMES]
    rew_row = F_IDX[f"a{trainee_idx}.reward"]
    done_row = F_IDX[f"a{trainee_idx}.done"]
    n_param = 5 * (2 if use_frozen else 1)

    def kernel(*refs):
        rng_ref = refs[0]
        sf_in, si_in, obs0_in = refs[1:4]
        tp = tuple(r[...] for r in refs[4:9])
        fp = tuple(r[...] for r in refs[9:14]) if use_frozen else None
        sf_out, si_out, obs_out, traj = refs[4 + n_param:8 + n_param]
        b = pl.program_id(0)
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            sf_out[...] = sf_in[...]
            si_out[...] = si_in[...]
            obs_out[...] = obs0_in[...]

        if external_noise:
            chunk = rng_ref[...]  # (EXT_NOISE_CHUNK, 8, blk_c)
            sim_noise = [chunk[r] for r in range(N_NOISE_ROWS)]
            # policy uniforms ride tiled in the chunk and are consumed
            # tiled — the same per-world values as the 1-D kernel's
            u_t = chunk[EXT_TRAINEE_U:EXT_TRAINEE_U + N_LOGITS]
            u_f = chunk[EXT_FROZEN_U:EXT_FROZEN_U + N_LOGITS]
        else:
            pltpu.prng_seed(rng_ref[0, 0],
                            b * TICK_STRIDE + rng_ref[0, 1] + t)
            # everything drawn TILED — a different, equally distributed
            # stream than the 1-D kernel's (n_draw, blk) draws
            su = _bits_to_unit(pltpu.bitcast(
                pltpu.prng_random_bits((N_NOISE_ROWS, 8, blk_c)),
                jnp.uint32))
            sim_noise = [2.0 * su[r] - 1.0
                         for r in range(N_NOISE_ROWS - 1)]
            sim_noise.append(su[N_NOISE_ROWS - 1])
            u = _bits_to_unit(pltpu.bitcast(
                pltpu.prng_random_bits((2 * N_LOGITS, 8, blk_c)),
                jnp.uint32))
            u_t = u[0:N_LOGITS]
            u_f = u[N_LOGITS:]

        # ---- policy on the PRE-TICK obs, FULLY TILED: the Gumbel-max
        # sampling chains run on (N_LOGITS, 8, blk_c) tensors (all 8
        # sublanes live) and each Dense layer is one rank-3 dot_general
        # over the whole tile (policy_forward_tiled).  No 1-D <-> tiled
        # relayout anywhere in the tick — the per-tick ~270-row scratch
        # relayout of the first prototype measured +0.32 ms at 8192x32
        # and ate the sim-segment win. ----
        logits, value = policy_forward_tiled(
            obs_out[ti_lo:ti_lo + OBS], *tp)
        actions, logp = sample_rows(logits, gumbel_from_uniform(u_t))
        for j in range(6):
            si_out[t_rows[j]] = actions[j]
        if use_frozen:
            f_logits, _ = policy_forward_tiled(
                obs_out[fi_lo:fi_lo + OBS], *fp)
            f_actions, _ = sample_rows(f_logits, gumbel_from_uniform(u_f))
            for j in range(6):
                si_out[f_rows[j]] = f_actions[j]

        # ---- trajectory rows (everything already tiled) ----
        traj[0, 0:ROLL_OBS] = obs_out[ti_lo:ti_lo + ROLL_OBS]
        for j in range(6):
            traj[0, R_ACT + j] = actions[j].astype(F32)
        traj[0, R_LOGP] = logp
        traj[0, R_VALUE] = value
        for r in (*range(R_LOGP + 1, R_VALUE),
                  *range(R_DONE + 1, ROLL_ROWS)):
            traj[0, r] = jnp.zeros((8, blk_c), F32)

        # ---- sim tick on (8, blk_c) tiles ----
        sf = [sf_out[r] for r in range(N_F32_ROWS)]
        si = [si_out[r] for r in range(N_I32_ROWS)]
        ag, ball, game, hoops = _load_dicts(sf, si)
        ag, ball, game, hoops, obs = step_fields(
            cfg, ag, ball, game, hoops, _noise_dict(sim_noise),
            compute_obs=True)
        sf2, si2 = _store_rows(ag, ball, game, hoops)
        for r in range(N_F32_ROWS):
            sf_out[r] = sf2[r]
        for r in range(N_I32_ROWS):
            si_out[r] = si2[r]
        for r in range(N_OBS_ROWS):
            obs_out[r] = obs[r]
        traj[0, R_REW] = sf2[rew_row]
        traj[0, R_DONE] = sf2[done_row]

    def state_spec(rows):
        return pl.BlockSpec((rows, 8, blk_c), lambda b, t: (0, 0, b),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda b, t: (0, 0),
                            memory_space=pltpu.VMEM)

    rng_spec = (pl.BlockSpec((EXT_NOISE_CHUNK, 8, blk_c),
                             lambda b, t: (t, 0, b),
                             memory_space=pltpu.VMEM)
                if external_noise
                else pl.BlockSpec(memory_space=pltpu.SMEM))
    h = 32
    policy_specs = [const_spec((OBS, 2)), const_spec((h, OBS)),
                    const_spec((h, h)), const_spec((N_LOGITS + 1, h)),
                    const_spec((h, 8))]
    in_specs = ([rng_spec, state_spec(N_F32_ROWS), state_spec(N_I32_ROWS),
                 state_spec(N_OBS_ROWS)] +
                policy_specs * (2 if use_frozen else 1))
    out_specs = [state_spec(N_F32_ROWS), state_spec(N_I32_ROWS),
                 state_spec(N_OBS_ROWS),
                 pl.BlockSpec((1, ROLL_ROWS, 8, blk_c),
                              lambda b, t: (t, 0, 0, b),
                              memory_space=pltpu.VMEM)]
    out_shape = [
        jax.ShapeDtypeStruct((N_F32_ROWS, 8, cols), F32),
        jax.ShapeDtypeStruct((N_I32_ROWS, 8, cols), I32),
        jax.ShapeDtypeStruct((N_OBS_ROWS, 8, cols), F32),
        jax.ShapeDtypeStruct((n_steps, ROLL_ROWS, 8, cols), F32),
    ]
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    W = num_worlds

    def rollout(rng, sf, si, obs0, *policy_mats):
        assert len(policy_mats) == n_param
        if external_noise:
            rng = rng.reshape(n_steps * EXT_NOISE_CHUNK, 8, cols)
        sf2, si2, obs2, traj = call(
            rng, sf.reshape(N_F32_ROWS, 8, cols),
            si.reshape(N_I32_ROWS, 8, cols),
            obs0.reshape(N_OBS_ROWS, 8, cols), *policy_mats)
        return (sf2.reshape(N_F32_ROWS, W), si2.reshape(N_I32_ROWS, W),
                obs2.reshape(N_OBS_ROWS, W),
                traj.reshape(n_steps, ROLL_ROWS, W))

    return rollout


def pack_rollout_noise(sim_chunks, trainee_u, frozen_u):
    """Assemble the external-noise matrix for the test path.

    sim_chunks: list of T (N_NOISE_ROWS, W) sim-noise matrices
    trainee_u / frozen_u: (T, N_LOGITS, W) uniforms in [0, 1)
    -> (T * EXT_NOISE_CHUNK, W)
    """
    rows = []
    for t, chunk in enumerate(sim_chunks):
        W = chunk.shape[1]
        block = jnp.zeros((EXT_NOISE_CHUNK, W), F32)
        block = block.at[0:N_NOISE_ROWS].set(chunk)
        block = block.at[EXT_TRAINEE_U:EXT_TRAINEE_U + N_LOGITS].set(
            trainee_u[t])
        block = block.at[EXT_FROZEN_U:EXT_FROZEN_U + N_LOGITS].set(
            frozen_u[t])
        rows.append(block)
    return jnp.concatenate(rows, axis=0)
