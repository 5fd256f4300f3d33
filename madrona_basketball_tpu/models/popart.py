"""Diagonal PopArt value-head normalization.

Functional port of the reference's `DiagonalPopArt` (scripts/agent.py:53-94)
— defined there but unused by the training path; kept for capability
parity.  Tracks EMA first/second moments of the targets and rescales the
value head's weight/bias so past predictions stay consistent when the
normalization statistics move ("Preserving Outputs Precisely while
Adaptively Rescaling Targets").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

F32 = jnp.float32
EPS = 1e-5


@struct.dataclass
class PopArtState:
    m: jax.Array       # (dim,) first moment
    v: jax.Array       # (dim,) second moment
    debias: jax.Array  # ()
    momentum: float = struct.field(pytree_node=False, default=0.1)


def popart_init(dim: int, momentum: float = 0.1) -> PopArtState:
    return PopArtState(m=jnp.zeros((dim,), F32),
                       v=jnp.full((dim,), EPS, F32),
                       debias=jnp.zeros((1,), F32), momentum=momentum)


def popart_normalize(st: PopArtState, x: jax.Array,
                     unnorm: bool = False) -> jax.Array:
    debias = jnp.clip(st.debias, min=EPS)
    mean = st.m / debias
    var = (st.v - jnp.square(st.m)) / debias
    if unnorm:
        return (mean + jnp.sqrt(var) * x).astype(x.dtype)
    return ((x - mean) * jax.lax.rsqrt(var)).astype(x.dtype)


def popart_update(st: PopArtState, x: jax.Array, head_kernel: jax.Array,
                  head_bias: jax.Array):
    """Update stats and return (state, rescaled_kernel, rescaled_bias)."""
    x = x.reshape(-1, x.shape[-1]).astype(F32)
    running_m = x.mean(axis=0)
    running_v = jnp.square(x).mean(axis=0)
    mom = st.momentum
    new_m = st.m * (1 - mom) + running_m * mom
    new_v = st.v * (1 - mom) + running_v * mom

    std = jnp.sqrt(st.v - jnp.square(st.m))
    new_std_inv = jax.lax.rsqrt(new_v - jnp.square(new_m))
    scale = std * new_std_inv
    shift = (st.m - new_m) * new_std_inv

    new_bias = head_bias * scale + shift
    new_kernel = head_kernel * scale[None, :]
    new_state = st.replace(m=new_m, v=new_v,
                           debias=st.debias * (1 - mom) + mom)
    return new_state, new_kernel, new_bias
