"""Fused PPO minibatch gradient: forward + hand-derived backward in ONE
Pallas kernel.

Profiling the production iteration (BENCHMARKS.md round 2) shows each
autodiff minibatch grad step costs ~500 us: XLA round-trips activations
through HBM between forward and backward, and the many (R, n<128)
row-major temporaries carry heavy lane padding.  The policy is a 2x32
MLP, so per 2048-sample block every activation fits in VMEM — this
kernel streams the minibatch feat rows from HBM once, transposes each
block to FEATURE-MAJOR on-chip (tensors are (features, R): full lane
utilization, only sublane padding), runs forward + manual backward, and
accumulates parameter gradients across grid steps in VMEM-resident
output blocks.

Per-bucket categorical math is expressed without python-loop slicing:
segment matmuls against a constant (n_buckets, N_LOGITS) membership
matrix compute bucket log-sum-exps, entropies, and their broadcasts as
dense (N_LOGITS, R) operations (a (19, R) slice per bucket would each
pad to full tiles and blow the scoped VMEM budget — the failure mode of
the first, row-major version of this kernel).

The differentiated function is exactly ppo/train.make_update_fns's
loss (packed-obs normalize, Dense->LayerNorm(fast variance)->ReLU x2,
combined actor+value head, clipped surrogate + clipped value loss +
entropy, means over the minibatch).  Gradient equivalence with jax.grad
of that loss is pinned by tests/test_fused_update.py.  Branch-tie note: at
exact ties jnp.maximum actually SPLITS the cotangent 0.5/0.5 between
operands; this kernel routes ties to the first operand instead.  The
two agree everywhere reachable — in the common unclipped-surrogate tie
both branches carry the SAME derivative, so any convex split sums to
it — and differ only on the measure-zero event ratio == 1 +- clip
exactly (0.75x vs 1x of -adv), which the equivalence tests cannot and
need not hit.
"""

from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C

F32 = jnp.float32
I32 = jnp.int32
BUCKETS = tuple(C.ACTION_BUCKETS)
N_LOGITS = sum(BUCKETS)           # 19
N_OUT = N_LOGITS + 1              # actor rows + value row
NB = len(BUCKETS)                 # 6
H = 32                            # hidden width
LN_EPS = 1e-6
RMS_EPS = 1e-5

# bias-matrix column layout (shared with the caller):
#   0 b1 | 1 ln1.scale | 2 ln1.bias | 3 b2 | 4 ln2.scale | 5 ln2.bias
#   6 head bias (first N_OUT rows) | 7 unused
N_BCOL = 8

# segment membership: SEG[b, j] = 1 iff logit j belongs to bucket b
_SEG = np.zeros((NB, N_LOGITS), np.float32)
_BASE = np.zeros((NB,), np.float32)  # first logit index of each bucket
_off = 0
for _b, _n in enumerate(BUCKETS):
    _SEG[_b, _off:_off + _n] = 1.0
    _BASE[_b] = _off
    _off += _n


def pack_norm(obs_rms, D: int):
    """RMSState -> the kernel's (2, D) [mean; rsqrt(var+eps)] matrix
    (fixed for the whole update phase)."""
    return jnp.stack([obs_rms.mean[:D],
                      jax.lax.rsqrt(obs_rms.var[:D] + RMS_EPS)],
                     axis=0).astype(F32)


def pack_weights(params, D: int):
    """Param pytree -> (w1t (H,D), w2t (H,H), wht (N_OUT,H),
    bias (H, N_BCOL)) — pre-transposed for the feature-major forward,
    recomputed per grad step from the live parameters (tiny)."""
    pp = params["params"]
    w1t = pp["Dense_0"]["kernel"][:D].T.astype(F32)
    w2t = pp["Dense_1"]["kernel"].T.astype(F32)
    wht = jnp.concatenate([pp["Dense_2"]["kernel"],
                           pp["Dense_3"]["kernel"]], axis=1).T.astype(F32)
    head_b = jnp.concatenate([pp["Dense_2"]["bias"],
                              pp["Dense_3"]["bias"]])
    head_b = jnp.pad(head_b, (0, H - N_OUT))
    bias = jnp.stack([
        pp["Dense_0"]["bias"], pp["LayerNorm_0"]["scale"],
        pp["LayerNorm_0"]["bias"], pp["Dense_1"]["bias"],
        pp["LayerNorm_1"]["scale"], pp["LayerNorm_1"]["bias"],
        head_b, jnp.zeros((H,), F32)], axis=1).astype(F32)
    return w1t, w2t, wht, bias


def grads_to_tree(params, dw1t, dw2t, dwht, dbias, D: int):
    """Kernel outputs (transposed orientations) -> a gradient pytree
    matching `params` (zeros for the unused obs-tail rows of Dense_0,
    exactly as autodiff of the sliced forward produces)."""
    full_rows = params["params"]["Dense_0"]["kernel"].shape[0]
    g = {
        "Dense_0": {
            "kernel": jnp.concatenate(
                [dw1t.T, jnp.zeros((full_rows - D, H), F32)], axis=0),
            "bias": dbias[:, 0],
        },
        "LayerNorm_0": {"scale": dbias[:, 1], "bias": dbias[:, 2]},
        "Dense_1": {"kernel": dw2t.T, "bias": dbias[:, 3]},
        "LayerNorm_1": {"scale": dbias[:, 4], "bias": dbias[:, 5]},
        "Dense_2": {"kernel": dwht.T[:, :N_LOGITS],
                    "bias": dbias[:N_LOGITS, 6]},
        "Dense_3": {"kernel": dwht.T[:, N_LOGITS:],
                    "bias": dbias[N_LOGITS:N_OUT, 6]},
    }
    return {"params": g}


def _ln_fwd(z, scale, bias):
    """Feature axis 0; flax fast-variance numerics."""
    mu = jnp.mean(z, axis=0, keepdims=True)
    mu2 = jnp.mean(z * z, axis=0, keepdims=True)
    var = jnp.maximum(mu2 - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    hhat = (z - mu) * rstd
    return hhat, rstd, hhat * scale + bias


def _ln_bwd(dy, hhat, rstd, scale):
    dhhat = dy * scale
    m1 = jnp.mean(dhhat, axis=0, keepdims=True)
    m2 = jnp.mean(dhhat * hhat, axis=0, keepdims=True)
    dz = rstd * (dhhat - m1 - hhat * m2)
    return dz, jnp.sum(dy * hhat, axis=1), jnp.sum(dy, axis=1)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=F32)


def _mm_rc(a, b):
    """Contract the trailing (R) axis of both operands: (m, R) x (n, R)
    -> (m, n)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=F32)


def _block_grads(hp, inv_mb, obs, act, lp_old, v_old, adv, ret,
                 nrm, w1t, w2t, wht, bias, seg, segT, base_col,
                 dw1_o, dw2_o, dwh_o, dbias_o):
    """Forward + manual backward for ONE feature-major block; accumulates
    parameter gradients into the (VMEM-resident, revisited) output refs.
    Shared by the contiguous-feat kernel and the scalar-prefetch kernel.

    obs (D, R), act (NB, R) as f32 indices, lp_old/v_old/adv/ret (R,)."""
    R = obs.shape[1]
    clip = hp.clip_coef
    vf_coef = hp.vf_coef
    ent_coef = hp.ent_coef

    def col(v):                           # (H,) -> (H, 1) broadcast
        return v[:, None]

    # ---------------- forward (feature-major) ----------------
    xn = jnp.clip((obs - col(nrm[0])) * col(nrm[1]), -5.0, 5.0)
    z1 = _mm(w1t, xn) + col(bias[:, 0])
    h1, rstd1, y1 = _ln_fwd(z1, col(bias[:, 1]), col(bias[:, 2]))
    a1 = jnp.maximum(y1, 0.0)
    z2 = _mm(w2t, a1) + col(bias[:, 3])
    h2, rstd2, y2 = _ln_fwd(z2, col(bias[:, 4]), col(bias[:, 5]))
    a2 = jnp.maximum(y2, 0.0)
    out = _mm(wht, a2) + bias[0:N_OUT, 6][:, None]   # (N_OUT, R)
    lg = out[0:N_LOGITS]                  # (19, R)
    value = out[N_LOGITS]                 # (R,)

    # global-max-shifted per-bucket softmax via segment matmuls
    M = jnp.max(lg, axis=0, keepdims=True)            # (1, R)
    E = jnp.exp(lg - M)                               # (19, R)
    S = _mm(seg, E)                                   # (NB, R)
    denom = _mm(segT, S)                              # (19, R)
    p = E / denom
    logz_b = jnp.log(S) + M                           # (NB, R)
    LZ = _mm(segT, logz_b)                            # (19, R)
    lognorm = lg - LZ                                 # log p
    # selected one-hot from action indices: row j in bucket b is
    # selected iff j == base_b + act_b
    target = _mm(segT, base_col + act)                # (19, R)
    # Mosaic iota must be integer-typed; cast for the float compare
    rows_idx = jax.lax.broadcasted_iota(
        I32, (N_LOGITS, R), 0).astype(F32)
    oh = (rows_idx == target).astype(F32)
    logp_new = jnp.sum(oh * lognorm, axis=0)          # (R,)
    ent_rows = p * lognorm                            # (19, R)
    H_b = -_mm(seg, ent_rows)                         # (NB, R)
    HB = _mm(segT, H_b)                               # (19, R)

    # ---------------- loss cotangents ----------------
    ratio = jnp.exp(logp_new - lp_old)
    surr1 = -adv * ratio
    rclip = jnp.clip(ratio, 1.0 - clip, 1.0 + clip)
    surr2 = -adv * rclip
    take1 = surr1 >= surr2
    inb = (ratio >= 1.0 - clip) & (ratio <= 1.0 + clip)
    dratio = jnp.where(take1, -adv, jnp.where(inb, -adv, 0.0))
    dlogp = dratio * ratio * inv_mb                   # (R,)

    if hp.clip_vloss:
        vf = (value - ret) ** 2
        dv_in = (value - v_old >= -clip) & (value - v_old <= clip)
        vclip = v_old + jnp.clip(value - v_old, -clip, clip)
        vfc = (vclip - ret) ** 2
        takev = vf >= vfc
        dvalue = jnp.where(
            takev, value - ret,
            jnp.where(dv_in, vclip - ret, 0.0)) * (vf_coef * inv_mb)
    else:
        dvalue = (value - ret) * (vf_coef * inv_mb)

    dlg = dlogp[None, :] * (oh - p) + \
        (ent_coef * inv_mb) * p * (lognorm + HB)
    dout = jnp.concatenate([dlg, dvalue[None, :]], axis=0)

    # ---------------- backward ----------------
    da2 = _mm(wht.T, dout)                            # (H, R)
    dwh_o[...] += _mm_rc(dout, a2)                    # (N_OUT, H)
    dbh = jnp.sum(dout, axis=1)                       # (N_OUT,)

    dy2 = da2 * (y2 > 0.0)
    dz2, dg2, dbe2 = _ln_bwd(dy2, h2, rstd2, col(bias[:, 4]))
    dw2_o[...] += _mm_rc(dz2, a1)                     # (H, H)
    db2 = jnp.sum(dz2, axis=1)
    da1 = _mm(w2t.T, dz2)

    dy1 = da1 * (y1 > 0.0)
    dz1, dg1, dbe1 = _ln_bwd(dy1, h1, rstd1, col(bias[:, 1]))
    dw1_o[...] += _mm_rc(dz1, xn)                     # (H, D)
    db1 = jnp.sum(dz1, axis=1)

    dbias_o[...] += jnp.stack([
        db1, dg1, dbe1, db2, dg2, dbe2,
        jnp.pad(dbh, (0, H - N_OUT)), jnp.zeros((H,), F32)], axis=1)


def make_fused_minibatch_grad(hp, D: int, mb_size: int,
                              block_rows: int = 2048,
                              interpret: bool = False):
    """Build grad_fn(feat_mb (mb, F), nrm, w1t, w2t, wht, bias) ->
    (dw1t, dw2t, dwht, dbias) for one minibatch.  F must carry the
    run_epochs column contract: obs 0:D | actions D:D+6 | logp | value_n
    | advantage | return_n."""
    assert mb_size % block_rows == 0
    grid = (mb_size // block_rows,)
    K = NB
    inv_mb = 1.0 / mb_size

    def kernel(feat, nrm_r, w1t_r, w2t_r, wht_r, bias_r, seg_r, segT_r,
               base_r, dw1_o, dw2_o, dwh_o, dbias_o):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1_o[...] = jnp.zeros_like(dw1_o)
            dw2_o[...] = jnp.zeros_like(dw2_o)
            dwh_o[...] = jnp.zeros_like(dwh_o)
            dbias_o[...] = jnp.zeros_like(dbias_o)

        ft = feat[...].T                      # (F, R) feature-major
        _block_grads(hp, inv_mb,
                     ft[0:D], ft[D:D + K], ft[D + K], ft[D + K + 1],
                     ft[D + K + 2], ft[D + K + 3],
                     nrm_r[...], w1t_r[...], w2t_r[...], wht_r[...],
                     bias_r[...], seg_r[...], segT_r[...], base_r[...],
                     dw1_o, dw2_o, dwh_o, dbias_o)

    def grad_fn(feat_mb, nrm, w1t, w2t, wht, bias):
        F = feat_mb.shape[-1]

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

        call = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, F), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                const_spec((2, D)), const_spec((H, D)),
                const_spec((H, H)), const_spec((N_OUT, H)),
                const_spec((H, N_BCOL)),
                const_spec((NB, N_LOGITS)), const_spec((N_LOGITS, NB)),
                const_spec((NB, 1)),
            ],
            out_specs=[const_spec((H, D)), const_spec((H, H)),
                       const_spec((N_OUT, H)), const_spec((H, N_BCOL))],
            out_shape=[
                jax.ShapeDtypeStruct((H, D), F32),
                jax.ShapeDtypeStruct((H, H), F32),
                jax.ShapeDtypeStruct((N_OUT, H), F32),
                jax.ShapeDtypeStruct((H, N_BCOL), F32),
            ],
            interpret=interpret,
        )
        return call(feat_mb, nrm, w1t, w2t, wht, bias,
                    jnp.asarray(_SEG), jnp.asarray(_SEG.T),
                    jnp.asarray(_BASE[:, None]))

    return grad_fn


# Side-channel row layout for the scalar-prefetch kernel: the GAE/update
# quantities that the reference recipe writes back into the rollout buffer
# (scripts/ppo.py:170-177) ride as a separate (T, SIDE_ROWS, W) array so
# the trajectory buffer itself is never copied or re-laid-out.
SIDE_VALUE = 0   # value, re-normalized with the post-GAE value_rms
SIDE_ADV = 1     # normalized advantage
SIDE_RET = 2     # normalized return
SIDE_ROWS = 8    # padded to a full f32 sublane tile


def make_fused_minibatch_grad_prefetch(hp, D: int, T: int, W: int,
                                       wb: int, interpret: bool = False,
                                       traj_dtype=F32):
    """Scalar-prefetch minibatch gradient: the epoch shuffle costs ZERO
    data movement.

    Instead of materializing a permuted copy of the (T*W, F) feat matrix
    every epoch (a pure-bandwidth gather that measured ~0.6 ms/epoch at
    8192x32, see BENCHMARKS.md), the block permutation rides as a
    scalar-prefetch operand and drives the input BlockSpec index maps:
    each grid step DMAs its (ROLL_ROWS, wb) block straight out of the
    rollout kernel's trajectory buffer — which is ALREADY feature-major
    (ops/fused_rollout.py traj is (T, ROLL_ROWS, W)), so the in-kernel
    block transpose disappears too.

    Shuffle granularity: one block = `wb` consecutive worlds at one tick
    (blocks are the units the epoch permutation deals to minibatches; the
    gradient is a mean over the minibatch, so ordering WITHIN a minibatch
    is irrelevant — only the block->minibatch partition matters).  The
    reference shuffles single samples (scripts/ppo.py:188); this is the
    shuffle_block deviation of PARITY.md at coarser grain, validated by
    the same learning-curve-overlay method.

    Returns grad_fn(idx (mb_blocks,) i32 block ids, traj (T, ROWS, W),
    side (T, SIDE_ROWS, W), nrm, w1t, w2t, wht, bias) -> (dw1t, dw2t,
    dwht, dbias).  Block id b maps to tick b // (W//wb), world-block
    b % (W//wb)."""
    assert W % wb == 0
    wblk = W // wb
    mb_size = hp.minibatch_size
    assert mb_size % wb == 0
    grid = (mb_size // wb,)
    K = NB
    inv_mb = 1.0 / mb_size

    def kernel(idx_ref, traj_blk, side_blk, nrm_r, w1t_r, w2t_r, wht_r,
               bias_r, seg_r, segT_r, base_r,
               dw1_o, dw2_o, dwh_o, dbias_o):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            dw1_o[...] = jnp.zeros_like(dw1_o)
            dw2_o[...] = jnp.zeros_like(dw2_o)
            dwh_o[...] = jnp.zeros_like(dwh_o)
            dbias_o[...] = jnp.zeros_like(dbias_o)

        blk = traj_blk[0].astype(F32)         # (ROWS, wb) feature-major
        sd = side_blk[0]                      # (SIDE_ROWS, wb)
        _block_grads(hp, inv_mb,
                     blk[0:D], blk[D:D + K], blk[D + K],
                     sd[SIDE_VALUE], sd[SIDE_ADV], sd[SIDE_RET],
                     nrm_r[...], w1t_r[...], w2t_r[...], wht_r[...],
                     bias_r[...], seg_r[...], segT_r[...], base_r[...],
                     dw1_o, dw2_o, dwh_o, dbias_o)

    def perm_map(i, idx):
        return (idx[i] // wblk, 0, idx[i] % wblk)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, idx: (0, 0),
                            memory_space=pltpu.VMEM)

    def grad_fn(idx, traj, side, nrm, w1t, w2t, wht, bias):
        # obs + actions + logp; the rest never read.  Rounded up to a
        # full sublane tile (8 rows f32, 16 rows bf16) so the
        # second-minor block dim stays Mosaic-aligned (the kernel
        # slices only rows 0..D+K).
        align = 8 if traj_dtype == F32 else 16
        rows = -(-(D + K + 1) // align) * align
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, rows, wb), perm_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SIDE_ROWS, wb), perm_map,
                             memory_space=pltpu.VMEM),
                const_spec((2, D)), const_spec((H, D)),
                const_spec((H, H)), const_spec((N_OUT, H)),
                const_spec((H, N_BCOL)),
                const_spec((NB, N_LOGITS)), const_spec((N_LOGITS, NB)),
                const_spec((NB, 1)),
            ],
            out_specs=[const_spec((H, D)), const_spec((H, H)),
                       const_spec((N_OUT, H)), const_spec((H, N_BCOL))],
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((H, D), F32),
                jax.ShapeDtypeStruct((H, H), F32),
                jax.ShapeDtypeStruct((N_OUT, H), F32),
                jax.ShapeDtypeStruct((H, N_BCOL), F32),
            ],
            interpret=interpret,
        )
        return call(idx.astype(I32), traj, side, nrm, w1t, w2t, wht, bias,
                    jnp.asarray(_SEG), jnp.asarray(_SEG.T),
                    jnp.asarray(_BASE[:, None]))

    return grad_fn


def unpack_weights(old_tree, w1t, w2t, wht, bias, D: int):
    """Inverse of pack_weights: kernel-orientation matrices -> a pytree
    with the SAME structure as `old_tree` (params / Adam mu / Adam nu).
    Rows >= D of Dense_0.kernel (the structurally-zero obs tail, which
    the kernel never touches because their gradients are exactly zero)
    are carried over from `old_tree` unchanged — exactly what optax
    would do with zero gradients for params, and zero moments stay
    zero."""
    pp = old_tree["params"]
    new = {
        "Dense_0": {
            "kernel": jnp.concatenate(
                [w1t.T, pp["Dense_0"]["kernel"][D:]], axis=0),
            "bias": bias[:, 0],
        },
        "LayerNorm_0": {"scale": bias[:, 1], "bias": bias[:, 2]},
        "Dense_1": {"kernel": w2t.T, "bias": bias[:, 3]},
        "LayerNorm_1": {"scale": bias[:, 4], "bias": bias[:, 5]},
        "Dense_2": {"kernel": wht.T[:, :N_LOGITS],
                    "bias": bias[:N_LOGITS, 6]},
        "Dense_3": {"kernel": wht.T[:, N_LOGITS:],
                    "bias": bias[N_LOGITS:N_OUT, 6]},
    }
    return {"params": new}


def make_fused_update_phase(hp, D: int, T: int, W: int, wb: int,
                            interpret: bool = False,
                            raw_side: bool = False,
                            traj_dtype=F32):
    """The ENTIRE PPO update phase — epochs x shuffled minibatches of
    gradient + global-norm clip + Adam — as ONE Pallas launch.

    The scalar-prefetch gradient kernel removed the epoch-shuffle data
    movement; what remained was 16 kernel launches interleaved with 16
    XLA segments of pack_weights / optax chain / tree rebuild.  Here the
    packed parameters and Adam moments live in VMEM-RESIDENT output
    blocks for the whole grid (constant index maps -> Mosaic revisits
    them and flushes once), gradients accumulate in VMEM scratch, and at
    every minibatch boundary the kernel applies, in place:

        optax.clip_by_global_norm(hp.max_grad_norm)   # exact formula
        optax.adam(hp.learning_rate, eps=1e-8)        # exact formulas

    (u = where(|g| < c, g, g/|g| * c); mu' = (1-b1) u + b1 mu;
    nu' = (1-b2) u^2 + b2 nu; p' = p - lr * (mu'/(1-b1^t)) /
    (sqrt(nu'/(1-b2^t)) + eps) — scripts/ppo.py:214,301 recipe,
    optax semantics pinned by tests/test_fused_update.py.)

    grid = (E * M * blocks_per_minibatch,): every epoch's block
    permutation rides in ONE prefetched index vector, so trajectory
    blocks stream permuted from HBM continuously across minibatch and
    epoch boundaries with zero host or XLA involvement.

    With raw_side=True (the fused-GAE contract, ops/fused_gae.py), the
    side rows carry RAW [value_un, advantage, return] and the kernel
    normalizes them per block using four scalars from an extra (1, 8)
    `ustats` operand: [v_mean', v_rstd'(=rsqrt(var'+normalize.EPS)),
    adv_mean, adv_rscale(=1/(sigma+1e-8))] — eliminating the XLA
    rms_normalize / advantage-normalize passes entirely.

    Returns update_fn(idx (E*NBLK,) i32, count () i32 Adam step count,
    traj, side, nrm[, ustats], w1t, w2t, wht, bias, m1..m4, v1..v4) ->
    (w1t', w2t', wht', bias', m1'..m4', v1'..v4')."""
    assert W % wb == 0
    wblk = W // wb
    mb_size = hp.minibatch_size
    assert mb_size % wb == 0
    if hp.num_minibatches * mb_size != T * W:
        # minibatch_size floors rollout_batch_size / num_minibatches; a
        # non-dividing minibatch count would make the grid consume fewer
        # idx entries per epoch than each epoch's permutation holds,
        # silently drifting later epochs into earlier permutations.
        raise ValueError(
            f"num_minibatches={hp.num_minibatches} must divide the "
            f"rollout batch ({T}*{W}={T * W} samples) exactly for the "
            f"fused update phase")
    bpm = mb_size // wb
    n_mb = hp.update_epochs * hp.num_minibatches
    grid = (n_mb * bpm,)
    K = NB
    inv_mb = 1.0 / mb_size
    lr = hp.learning_rate
    max_norm = hp.max_grad_norm
    B1, B2, EPS_ADAM = 0.9, 0.999, 1e-8
    # The bias-correction below computes beta**t as exp(t*log(beta)) —
    # valid only for 0 < beta < 1.  If a beta is ever made configurable,
    # beta == 0 (no-momentum Adam) needs a lax.pow/select path instead.
    assert 0.0 < B1 < 1.0 and 0.0 < B2 < 1.0

    def kernel(idx_ref, cnt_ref, traj_blk, side_blk, nrm_r, *rest):
        if raw_side:
            ustats_r = rest[0]
            rest = rest[1:]
        (seg_r, segT_r, base_r,
         w1_in, w2_in, wh_in, b_in,
         m1_in, m2_in, mh_in, mb_in,
         v1_in, v2_in, vh_in, vb_in,
         w1_o, w2_o, wh_o, b_o,
         m1_o, m2_o, mh_o, mb_o,
         v1_o, v2_o, vh_o, vb_o,
         g1_s, g2_s, gh_s, gb_s) = rest
        i = pl.program_id(0)
        p_o = (w1_o, w2_o, wh_o, b_o)
        m_o = (m1_o, m2_o, mh_o, mb_o)
        v_o = (v1_o, v2_o, vh_o, vb_o)
        g_s = (g1_s, g2_s, gh_s, gb_s)

        @pl.when(i == 0)
        def _():
            for dst, src in zip(p_o + m_o + v_o,
                                (w1_in, w2_in, wh_in, b_in, m1_in, m2_in,
                                 mh_in, mb_in, v1_in, v2_in, vh_in,
                                 vb_in)):
                dst[...] = src[...]
            for g in g_s:
                g[...] = jnp.zeros_like(g)

        blk = traj_blk[0].astype(F32)
        sd = side_blk[0]
        if raw_side:
            us = ustats_r[...]
            vm, vr = us[0, 0], us[0, 1]
            am, ar = us[0, 2], us[0, 3]
            v_n = jnp.clip((sd[SIDE_VALUE] - vm) * vr, -5.0, 5.0)
            a_n = (sd[SIDE_ADV] - am) * ar
            r_n = jnp.clip((sd[SIDE_RET] - vm) * vr, -5.0, 5.0)
        else:
            v_n = sd[SIDE_VALUE]
            a_n = sd[SIDE_ADV]
            r_n = sd[SIDE_RET]
        _block_grads(hp, inv_mb,
                     blk[0:D], blk[D:D + K], blk[D + K],
                     v_n, a_n, r_n,
                     nrm_r[...], w1_o[...], w2_o[...], wh_o[...],
                     b_o[...], seg_r[...], segT_r[...], base_r[...],
                     g1_s, g2_s, gh_s, gb_s)

        @pl.when((i + 1) % bpm == 0)
        def _():
            # minibatch boundary: clip_by_global_norm + adam, in place
            gs = [g[...] for g in g_s]
            gn = jnp.sqrt(sum(jnp.sum(g * g) for g in gs))
            small = gn < max_norm
            t_step = (cnt_ref[0] + (i + 1) // bpm).astype(F32)
            # beta**t as exp(t*log(beta)): lax.pow with a traced f32
            # exponent emits math.powf, which Mosaic cannot legalize on
            # TPU; log(beta) folds to a trace-time constant and exp
            # lowers natively.  |rel err| ~1 ulp, inside the 2e-6 optax
            # pin of tests/test_fused_update.py.
            bc1 = 1.0 - jnp.exp(t_step * math.log(B1))
            bc2 = 1.0 - jnp.exp(t_step * math.log(B2))
            for p, m, v, g in zip(p_o, m_o, v_o, gs):
                u = jnp.where(small, g, (g / gn) * max_norm)
                m_new = (1.0 - B1) * u + B1 * m[...]
                v_new = (1.0 - B2) * (u * u) + B2 * v[...]
                m[...] = m_new
                v[...] = v_new
                p[...] -= lr * ((m_new / bc1) /
                                (jnp.sqrt(v_new / bc2) + EPS_ADAM))
            for g in g_s:
                g[...] = jnp.zeros_like(g)

    def perm_map(i, idx, cnt):
        return (idx[i] // wblk, 0, idx[i] % wblk)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i, idx, cnt: (0, 0),
                            memory_space=pltpu.VMEM)

    SHAPES = ((H, D), (H, H), (N_OUT, H), (H, N_BCOL))

    def update_fn(idx, count, traj, side, nrm, *rest):
        if raw_side:
            ustats, mats = rest[0], rest[1:]
            ustats_specs = [const_spec((1, 8))]
            ustats_args = (ustats,)
        else:
            mats = rest
            ustats_specs = []
            ustats_args = ()
        assert len(mats) == 12
        # the kernel touches only rows 0..D+K (obs, actions, logp) of
        # each trajectory block — v_old/adv/ret ride in `side` — so the
        # DMA block stops there instead of pulling all ROLL_ROWS.
        # Rounded up to a full sublane tile (8 rows f32, 16 rows bf16)
        # for Mosaic alignment (the kernel slices only rows 0..D+K).
        align = 8 if traj_dtype == F32 else 16
        rows = -(-(D + K + 1) // align) * align
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, rows, wb), perm_map,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, SIDE_ROWS, wb), perm_map,
                             memory_space=pltpu.VMEM),
                const_spec((2, D)),
            ] + ustats_specs + [
                const_spec((NB, N_LOGITS)), const_spec((N_LOGITS, NB)),
                const_spec((NB, 1)),
            ] + [const_spec(s) for s in SHAPES * 3],
            out_specs=[const_spec(s) for s in SHAPES * 3],
            scratch_shapes=[pltpu.VMEM(s, F32) for s in SHAPES],
        )
        call = pl.pallas_call(
            kernel,
            grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct(s, F32) for s in SHAPES * 3],
            interpret=interpret,
        )
        return call(idx.astype(I32), count.reshape(1).astype(I32),
                    traj, side, nrm, *ustats_args, jnp.asarray(_SEG),
                    jnp.asarray(_SEG.T), jnp.asarray(_BASE[:, None]),
                    *mats)

    return update_fn


def pick_update_block(W: int, mb_size: int, cap: int = 4096) -> int:
    """Largest power-of-two block width <= cap dividing both the world
    count and the minibatch size (1 always qualifies).

    cap=4096 since round 5: halving the grid-step count vs wb=2048
    measures 2.43 vs 2.48 ms/iter chunked at 8192 envs with an
    equivalent 2000-iteration convergence curve (bench_update_wb.py,
    bench_logs/r5 ab-wb4096 vs ab-f32); wb=8192 fails backend compile
    (scoped-VMEM)."""
    import math
    g = math.gcd(W, mb_size)
    for cand in (4096, 2048, 1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= cap and g % cand == 0:
            return cand
    raise AssertionError("unreachable: 1 divides every gcd")
