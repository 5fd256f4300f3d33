"""Fused execution backend: the whole fleet step as one Pallas kernel.

Drop-in alternative to `engine.step_batch` holding state in the flat SoA
row layout (ops/layout.py).  RNG is keyed identically to the structured
engine (per-world key split + the same draw), so both backends walk the same
trajectories up to floating-point reassociation; tests/test_fused.py locks
the agreement down.

Use `backend="xla"` on CPU (Mosaic is TPU-only) or for debugging;
`backend="pallas"` on TPU for speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import constants as C
from . import engine
from . import systems as S
from .config import SimConfig
from .ops import layout
from .ops.fused_step import fused_step_xla, make_fused_step
from .state import State

F32 = jnp.float32


def noise_to_rows(shot_u, reset_u):
    """(W, A, 3) + (W, 3) -> (N_NOISE_ROWS, W), the kernel's layout."""
    W = shot_u.shape[0]
    return jnp.concatenate([
        shot_u.reshape(W, -1), reset_u.reshape(W, -1)], axis=1).T


def make_noise_fn(cfg: SimConfig):
    """Per-world key split + draw, identical to engine.step's RNG use."""

    def draw(keys):
        def per_world(k):
            k2, nk = jax.random.split(k)
            n = S.draw_noise(cfg, nk)
            return k2, jnp.concatenate([n.shot_u.reshape(-1), n.reset_u])

        keys2, flat = jax.vmap(per_world)(keys)
        return keys2, flat.T  # (N_NOISE_ROWS, W)

    return draw


class FusedEngine:
    """Holds (SF, SI, OBS, keys) and steps the whole fleet per call."""

    def __init__(self, cfg: SimConfig, num_worlds: int, seed: int = 0,
                 block: int = 2048, backend: str = "pallas",
                 interpret: bool = False,
                 init_state: State | None = None):
        self.cfg = cfg
        self.num_worlds = num_worlds
        if init_state is None:
            init_state = engine.init_batch(cfg, jax.random.PRNGKey(seed),
                                           num_worlds)
        self.sf, self.si = layout.pack(init_state)
        self.obs = jnp.zeros((layout.N_OBS_ROWS, num_worlds), F32)
        self.keys = init_state.key

        noise_fn = make_noise_fn(cfg)
        if backend == "pallas":
            from .ops.fused_step import pick_block
            block = pick_block(num_worlds, block)
            kernel = make_fused_step(cfg, num_worlds, block=block,
                                     interpret=interpret)
        elif backend == "xla":
            kernel = functools.partial(fused_step_xla, cfg)
        else:
            raise ValueError(backend)
        self._backend = backend
        self._block = block
        self._interpret = interpret
        self._multistep_cache: dict = {}
        self._multistep_calls = 0

        @jax.jit
        def step_all(keys, sf, si):
            keys, noise = noise_fn(keys)
            sf, si, obs = kernel(sf, si, noise)
            return keys, sf, si, obs

        self._step_all = step_all

    def step(self):
        self.keys, self.sf, self.si, self.obs = self._step_all(
            self.keys, self.sf, self.si)

    def step_many(self, n_steps: int):
        """Advance every world `n_steps` ticks.

        On the Pallas backend this is ONE kernel launch with the fleet
        state resident in VMEM across all ticks and per-tick noise from
        the on-chip PRNG (ops/fused_step.make_fused_multistep) — the
        fastest held-action stepping shape (actions persist in state, so
        hardCodeDefense keeps driving unwritten agents each tick, exactly
        as in repeated `step()` calls).  The PRNG seed derives from a
        deterministic per-engine call counter; the kernel folds its block
        index in itself.  Other backends loop `step()` (same semantics,
        per-tick dispatch).
        """
        if n_steps <= 0:
            return
        if self._backend != "pallas":
            for _ in range(n_steps):
                self.step()
            return
        from .ops.fused_step import make_fused_multistep
        kern = self._multistep_cache.get(n_steps)
        if kern is None:
            if len(self._multistep_cache) >= 8:
                # one compiled executable per distinct K; bound the set
                self._multistep_cache.pop(next(iter(self._multistep_cache)))
            kern = jax.jit(make_fused_multistep(
                self.cfg, self.num_worlds, n_steps, block=self._block,
                interpret=self._interpret))
            self._multistep_cache[n_steps] = kern
        seed = jnp.array([self._multistep_calls], jnp.int32)
        self._multistep_calls += 1
        self.sf, self.si, self.obs = kern(seed, self.sf, self.si)

    def set_actions(self, actions: jax.Array):
        """Write a (W, A, 6) action tensor into the row state."""
        actions = actions.astype(jnp.int32)
        si = self.si
        for i in range(C.NUM_AGENTS):
            for j, name in enumerate(("a_move", "a_angle", "a_rotate",
                                      "a_grab", "a_pass", "a_shoot")):
                si = si.at[layout.I_IDX[f"a{i}.{name}"]].set(actions[:, i, j])
        self.si = si

    def trainee_obs(self, agent_idx: int) -> jax.Array:
        """(W, 128) observation slice for one agent (no transpose needed by
        the MXU, but host callers get the standard layout)."""
        lo = agent_idx * C.OBS_SIZE
        return self.obs[lo:lo + C.OBS_SIZE, :].T

    def state(self) -> State:
        """Materialize the structured State (for export / viewer / ckpt)."""
        return layout.unpack(self.cfg, self.sf, self.si, self.keys,
                             obs=self.obs)
