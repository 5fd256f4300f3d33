"""Running mean/std observation & value normalization.

Functional port of the reference's `RunningMeanStd` (scripts/agent.py:19-50):
the same parallel (Chan) merge of batch statistics into running mean/var,
with clamped normalization.  State lives in a small pytree instead of torch
buffers.

Numerics note: the reference keeps f64 buffers; TPUs are f32-native, so the
state is f32 here.  The merge arithmetic is ordered to stay well-conditioned
(delta-form update); the parity test (tests/test_models.py) checks agreement
with the actual torch implementation over many batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

F32 = jnp.float32


@struct.dataclass
class RMSState:
    mean: jax.Array   # (dim,) f32
    var: jax.Array    # (dim,) f32
    count: jax.Array  # () f32


def rms_init(dim: int) -> RMSState:
    return RMSState(mean=jnp.zeros((dim,), F32),
                    var=jnp.ones((dim,), F32),
                    count=jnp.ones((), F32))


EPS = 1e-5


def rms_normalize(st: RMSState, x: jax.Array, clamp: float = 5.0) -> jax.Array:
    out = (x - st.mean) * jax.lax.rsqrt(st.var + EPS)
    if clamp:
        out = jnp.clip(out, -clamp, clamp)
    return out


def rms_unnormalize(st: RMSState, x: jax.Array,
                    clamp: float = 5.0) -> jax.Array:
    if clamp:
        x = jnp.clip(x, -clamp, clamp)
    return st.mean + jnp.sqrt(st.var + EPS) * x


def _rms_merge(st: RMSState, mean, var, count) -> RMSState:
    """Chan parallel merge of batch (mean, var, count) into the running
    stats (scripts/agent.py:40-50)."""
    count_ = count + st.count
    delta = mean - st.mean
    m = (st.var * st.count + var * count +
         delta ** 2 * st.count * count / count_)
    return RMSState(mean=st.mean + delta * count / count_,
                    var=m / count_,
                    count=count_)


def _pad_tail(st: RMSState, used: int, n):
    """Closed-form Chan merge for features that are implicitly ALL ZERO
    in the batch (delta = -mean, batch var = 0)."""
    count_ = st.count + n
    pad_mean = st.mean[used:]
    pad_var = st.var[used:]
    new_pad_mean = pad_mean * (st.count / count_)
    m = pad_var * st.count + pad_mean ** 2 * st.count * n / count_
    return new_pad_mean, m / count_


def rms_update_padded(st: RMSState, x: jax.Array) -> RMSState:
    """rms_update where the batch's features >= x.shape[-1] are
    implicitly ALL ZERO and not materialized (the obs tail padding,
    constants.OBS_USED).  Bit-equivalent to rms_update on the
    zero-padded batch: a zero batch has mean 0 and variance 0, so the
    padded dims follow the closed-form Chan merge with those values."""
    used = x.shape[-1]
    sub = rms_update(RMSState(mean=st.mean[:used], var=st.var[:used],
                              count=st.count), x)
    n = jnp.asarray(x.reshape(-1, used).shape[0], F32)
    new_pad_mean, new_pad_var = _pad_tail(st, used, n)
    return RMSState(
        mean=jnp.concatenate([sub.mean, new_pad_mean]),
        var=jnp.concatenate([sub.var, new_pad_var]),
        count=sub.count)


def rms_update_padded_tdw(st: RMSState, x: jax.Array) -> RMSState:
    """rms_update_padded where the batch rides FEATURE-MAJOR as
    (T, used, W) — the rollout kernel's trajectory layout — so the
    stats reduce over (T, W) directly without materializing the
    (T*W, used) relayout."""
    used = x.shape[1]
    n = jnp.asarray(x.shape[0] * x.shape[2], F32)
    mean = jnp.mean(x, axis=(0, 2))
    var = jnp.sum((x - mean[None, :, None]) ** 2,
                  axis=(0, 2)) / jnp.maximum(n - 1.0, 1.0)
    sub = _rms_merge(RMSState(mean=st.mean[:used], var=st.var[:used],
                              count=st.count), mean, var, n)
    new_pad_mean, new_pad_var = _pad_tail(st, used, n)
    return RMSState(
        mean=jnp.concatenate([sub.mean, new_pad_mean]),
        var=jnp.concatenate([sub.var, new_pad_var]),
        count=sub.count)


def rms_update_padded_moments(st: RMSState, mean: jax.Array,
                              m2: jax.Array, n) -> RMSState:
    """rms_update_padded_tdw from precomputed per-feature batch moments
    (mean, centered M2, count) — the contract of
    ops/fused_gae.make_obs_moments, which reduces the trajectory obs
    rows in one HBM pass instead of two."""
    used = mean.shape[0]
    n = jnp.asarray(n, F32)
    var = m2 / jnp.maximum(n - 1.0, 1.0)
    sub = _rms_merge(RMSState(mean=st.mean[:used], var=st.var[:used],
                              count=st.count), mean, var, n)
    new_pad_mean, new_pad_var = _pad_tail(st, used, n)
    return RMSState(
        mean=jnp.concatenate([sub.mean, new_pad_mean]),
        var=jnp.concatenate([sub.var, new_pad_var]),
        count=sub.count)


def rms_update(st: RMSState, x: jax.Array) -> RMSState:
    """Merge a batch (N, dim) into the running stats (scripts/agent.py:40-50).

    Uses the unbiased batch variance, matching torch.var_mean(unbiased=True).
    """
    x = x.reshape(-1, x.shape[-1]).astype(F32)
    count = jnp.asarray(x.shape[0], F32)
    mean = jnp.mean(x, axis=0)
    var = jnp.sum((x - mean) ** 2, axis=0) / jnp.maximum(count - 1.0, 1.0)
    return _rms_merge(st, mean, var, count)
