"""GAE + side-array assembly as one Pallas kernel.

After the one-launch update phase (ops/fused_update.py), the XLA
segment between the rollout kernel and the update kernel is dominated
by several full-trajectory passes: value unnormalization, the 32-step
`lax.scan` GAE recursion, two `rms_update` reductions, the advantage
mean/std reductions, two `rms_normalize` passes and the (T, SIDE_ROWS,
W) side-array concatenation.  This kernel folds all of the (T, W)-sized
work into ONE pass over W-blocks:

  - unnormalizes values in place (pre-update value_rms scalars ride in
    a tiny const operand),
  - runs the reverse GAE recursion with the reference's t == T-1
    boundary quirk (ops/gae.py, scripts/ppo.py:156-161) as an unrolled
    loop over VMEM rows,
  - writes the side array RAW (unnormalized values / raw advantages /
    raw returns) in its final (T, SIDE_ROWS, W) block geometry, and
  - emits per-block two-pass (mean, M2) moments for values,
    advantages and returns.

Normalization moves INTO the update kernel (make_fused_update_phase
raw_side=True): the post-GAE value_rms and the advantage mean/std are
closed-form functions of the block moments (Chan's merge,
models/normalize._rms_merge), so they cost a handful of scalar ops in
XLA instead of four more full-array passes.

The recipe being fused is `/root/reference/scripts/ppo.py:144-177`
(compute_advantages: unnorm -> reversed GAE loop -> normalizer updates
-> in-place normalization).  Equivalence with the unfused path is
pinned by tests/test_fused_gae.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_update import SIDE_ROWS

F32 = jnp.float32

# vstats column layout (input): [value_mean, value_sigma] of the
# PRE-update value_rms (sigma = sqrt(var + normalize.EPS), the
# rms_unnormalize scale).
VSTAT_COLS = 8


def pick_gae_block(W: int, cap: int = 1024) -> int:
    """Largest power-of-two worlds-per-block <= cap dividing W."""
    for cand in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= cap and W % cand == 0:
            return cand
    raise AssertionError("unreachable: 1 divides every W")


def make_fused_gae(T: int, W: int, gamma: float, lam: float,
                   r_value: int, r_rew: int, r_done: int,
                   gb: int | None = None, interpret: bool = False,
                   traj_dtype=F32):
    """Build gae_fn(traj (T, rows, W), carry (2, W), next_value_n
    (1, W), vstats (1, VSTAT_COLS)) ->
    (side (T, SIDE_ROWS, W), moments (n_blocks, 8), carry' (2, W),
    ticks (n_blocks, T, 8)).

    The value/reward/done rows stream straight out of the rollout
    kernel's trajectory buffer via row-sliced BlockSpecs (r_value /
    r_rew / r_done are the trajectory row indices — no XLA slice
    copies).  Alongside GAE, the kernel also runs the per-world
    episode-stats recursion (ppo/train._stats_step's curr/lens carry:
    accumulate, sample at done, reset) and emits per-(block, tick)
    partial sums so the windowed-meter recursion reduces to T scalar
    steps in XLA.

    side rows: [value_un, advantage_raw, return_raw, 0...] (the
    raw_side contract of make_fused_update_phase).
    moments cols: [v_mean, v_M2, a_mean, a_M2, r_mean, r_M2, 0, 0]
    per block of T * gb samples (two-pass, so no catastrophic
    cancellation on the value moments).
    carry rows: [curr_rewards; episode_lengths].
    ticks cols: [done_count, sum(curr*done), sum(lens*done), 0...]."""
    gb = gb or pick_gae_block(W)
    assert W % gb == 0
    n_blocks = W // gb
    n_per = float(T * gb)
    # Mosaic requires the block's second-to-last dim to be a multiple of
    # the sublane tile (8 for f32, 16 for bf16) — a (T, 1, gb)
    # single-row slice of the trajectory fails to lower on real TPU
    # (interpret mode does not check).  Stream one (T, ww, gb) operand
    # per aligned ww-row window touching {r_value, r_rew, r_done} and
    # slice in-kernel (upcasting bf16 trajectories to f32 on load).
    ww = 8 if traj_dtype == F32 else 16
    windows = sorted({r // ww for r in (r_value, r_rew, r_done)})

    def locate(r):
        return windows.index(r // ww), r % ww

    def kernel(*refs):
        w_refs = refs[:len(windows)]
        (c_ref, nv_ref, vs_ref, side_o, mom_o, carry_o,
         tick_o) = refs[len(windows):]

        def row(r):
            wi, off = locate(r)
            return w_refs[wi][:, off, :].astype(F32)            # (T, gb)

        vs = vs_ref[...]                        # (1, VSTAT_COLS)
        vmean = vs[0, 0]
        vsig = vs[0, 1]
        vals = row(r_value)                                     # (T, gb)
        rew = row(r_rew)
        dn = row(r_done)
        v_un = vmean + vsig * jnp.clip(vals, -5.0, 5.0)
        next_un = vmean + vsig * jnp.clip(nv_ref[...], -5.0, 5.0)
        nd = 1.0 - dn
        # reference boundary quirk: at t == T-1 the mask is
        # not_dones[T-1] paired with the bootstrap value
        nvs = jnp.concatenate([v_un[1:], next_un], axis=0)
        nnt = jnp.concatenate([nd[1:], nd[T - 1:T]], axis=0)
        deltas = rew + gamma * nvs * nnt - v_un

        lastgae = jnp.zeros((1, gb), F32)
        adv_rows = [None] * T
        for t in reversed(range(T)):
            lastgae = deltas[t:t + 1] + \
                (gamma * lam) * nnt[t:t + 1] * lastgae
            adv_rows[t] = lastgae
        adv = jnp.concatenate(adv_rows, axis=0)                 # (T, gb)
        ret = adv + v_un

        side_o[...] = jnp.concatenate(
            [v_un[:, None, :], adv[:, None, :], ret[:, None, :],
             jnp.zeros((T, SIDE_ROWS - 3, gb), F32)], axis=1)

        cells = []
        for x in (v_un, adv, ret):
            m = jnp.sum(x) * (1.0 / n_per)
            m2 = jnp.sum((x - m) * (x - m))
            cells.append(m.reshape(1, 1))
            cells.append(m2.reshape(1, 1))
        mom_row = jnp.concatenate(cells + [jnp.zeros((1, 2), F32)],
                                  axis=1)                       # (1, 8)
        # The moments block is VMEM-resident across the whole grid
        # (constant index map — a (1, 8) per-step block would break the
        # 8-sublane rule); write this step's row via a one-hot mask.
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            mom_o[...] = jnp.zeros_like(mom_o)

        sub = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, 8), 0)
        mom_o[...] = jnp.where(sub == i, mom_row, mom_o[...])

        # episode-stats forward recursion (_stats_step semantics:
        # sample curr+rew and lens+1 at done, then reset)
        curr = c_ref[0:1, :]
        lens = c_ref[1:2, :]
        cnt_c, rs_c, ls_c = [], [], []
        for t in range(T):
            d = dn[t:t + 1]
            curr = curr + rew[t:t + 1]
            lens = lens + 1.0
            cnt_c.append(jnp.sum(d).reshape(1, 1))
            rs_c.append(jnp.sum(curr * d).reshape(1, 1))
            ls_c.append(jnp.sum(lens * d).reshape(1, 1))
            curr = curr * (1.0 - d)
            lens = lens * (1.0 - d)
        carry_o[...] = jnp.concatenate([curr, lens], axis=0)
        tick_o[...] = jnp.concatenate(
            [jnp.concatenate(cnt_c, axis=0),
             jnp.concatenate(rs_c, axis=0),
             jnp.concatenate(ls_c, axis=0),
             jnp.zeros((T, 5), F32)], axis=1)[None]

    def gae_fn(traj, carry, next_value_n, vstats):
        call = pl.pallas_call(
            kernel,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((T, ww, gb), lambda i, w=w: (0, w, i),
                             memory_space=pltpu.VMEM)
                for w in windows
            ] + [
                pl.BlockSpec((2, gb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, gb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, VSTAT_COLS), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((T, SIDE_ROWS, gb), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_blocks, 8), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, gb), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((T, SIDE_ROWS, W), F32),
                jax.ShapeDtypeStruct((n_blocks, 8), F32),
                jax.ShapeDtypeStruct((2, W), F32),
                jax.ShapeDtypeStruct((n_blocks, T, 8), F32),
            ],
            interpret=interpret,
        )
        return call(*([traj] * len(windows)), carry, next_value_n,
                    vstats)

    gae_fn.gb = gb
    gae_fn.n_blocks = n_blocks
    return gae_fn


def chan_fold(out_ref, x, n_tile: float, first):
    """Fold one (rows, n_tile) tile's per-row moments into the running
    (rows, 8) [mean, M2, n, 0, ...] accumulator ref via Chan's
    incremental merge.  `first` is a traced bool predicate selecting
    the initialization branch; `n_tile` is the static tile width.
    Shared by make_obs_moments below and the rollout kernel's in-loop
    accumulator (ops/fused_rollout.py) so the merge numerics live in
    exactly one place."""
    rows = x.shape[0]
    m_b = jnp.sum(x, axis=1, keepdims=True) * (1.0 / n_tile)
    m2_b = jnp.sum((x - m_b) * (x - m_b), axis=1, keepdims=True)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.concatenate(
            [m_b, m2_b, jnp.full((rows, 1), n_tile, F32),
             jnp.zeros((rows, 5), F32)], axis=1)

    @pl.when(jnp.logical_not(first))
    def _():
        acc = out_ref[...]
        m_run = acc[:, 0:1]
        m2_run = acc[:, 1:2]
        n_run = acc[:, 2:3]
        n_new = n_run + n_tile
        delta = m_b - m_run
        out_ref[...] = jnp.concatenate(
            [m_run + delta * (n_tile / n_new),
             m2_run + m2_b + delta * delta * (n_run * n_tile / n_new),
             n_new, jnp.zeros((rows, 5), F32)], axis=1)


def make_obs_moments(T: int, W: int, used: int, gb: int | None = None,
                     interpret: bool = False, traj_dtype=F32):
    """One-pass per-feature obs moments over the trajectory buffer.

    The XLA obs-normalizer update (models/normalize.rms_update_padded_tdw)
    reads the (T, used, W) obs rows TWICE (mean pass + centered-M2
    pass, ~216 MB of HBM traffic at 8192x32).  This kernel streams each
    (used, gb) tile once and folds it into a running (mean, M2, n)
    per-feature accumulator with Chan's incremental merge, held in a
    VMEM-resident output block — one 108 MB pass, numerically the
    two-pass-per-tile + Chan-merge scheme (no E[x^2]-mean^2
    cancellation).

    Returns mom_fn(traj (T, rows, W)) -> (used, 8) with cols
    [mean, M2, n, 0...]; batch unbiased var = M2 / (n - 1)."""
    gb = gb or pick_gae_block(W)
    assert W % gb == 0
    n_wb = W // gb
    fgb = float(gb)
    # sublane-aligned DMA: `used` (103) is not a multiple of the
    # sublane tile (8 for f32, 16 for bf16), so the streamed block
    # rounds up and the kernel slices the live rows
    align = 8 if traj_dtype == F32 else 16
    used_pad = -(-used // align) * align

    def kernel(x_ref, out_o):
        i = pl.program_id(0)
        chan_fold(out_o, x_ref[0, :used].astype(F32), fgb, i == 0)

    def mom_fn(traj):
        call = pl.pallas_call(
            kernel,
            grid=(T * n_wb,),
            in_specs=[
                pl.BlockSpec((1, used_pad, gb),
                             lambda i: (i // n_wb, 0, i % n_wb),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((used, 8), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((used, 8), F32),
            interpret=interpret,
        )
        return call(traj)

    return mom_fn


def combine_block_moments(means, m2s, n_per: float):
    """Chan combine of equal-count per-block (mean, M2) pairs ->
    (mean, unbiased variance, count) of the full batch."""
    k = means.shape[0]
    n_total = n_per * k
    gmean = jnp.mean(means)
    m2 = jnp.sum(m2s) + n_per * jnp.sum((means - gmean) ** 2)
    var = m2 / jnp.maximum(n_total - 1.0, 1.0)
    return gmean, var, n_total
