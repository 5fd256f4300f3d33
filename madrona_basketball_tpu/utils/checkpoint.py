"""Checkpointing.

Two levels, extending the reference's contract:
  * Agent checkpoints — network params + both normalizer states, saved as a
    flax-msgpack file under `checkpoints/{model}/{model}_{iter}.ckpt`,
    mirroring the reference's torch.save naming scheme
    (scripts/ppo.py:337-350); the self-play league's state *is* this naming
    scheme (scripts/self_play.py:116-120).
  * Full train-state checkpoints via Orbax (params + optimizer + env state +
    iteration) — the reference cannot resume optimization (SURVEY §5); this
    can.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from flax import serialization

from ..models.agent import AgentParams, init_agent


def save_agent(agent: AgentParams, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(agent)))
    return path


def _check_obs_tail(ap: AgentParams, path: str) -> AgentParams:
    """The packed-feat update (constants.OBS_USED) is bit-identical to
    the full-width forward ONLY when the obs normalizer's tail mean is
    exactly zero — guaranteed for anything trained here (the tail obs
    slots are structural zeros, src/game.cpp:1456-1460), but a
    hand-edited or foreign checkpoint could violate it silently.  Zero
    the tail and warn rather than diverge without notice."""
    import numpy as np

    from .. import constants as C
    tail = np.asarray(jax.device_get(ap.obs_rms.mean[C.OBS_USED:]))
    if tail.size and np.any(tail != 0.0):
        import warnings
        warnings.warn(
            f"{path}: obs_rms.mean[{C.OBS_USED}:] is nonzero "
            f"(max |x| = {np.max(np.abs(tail))}) — these observation "
            "slots are structurally zero in this environment, so the "
            "stats cannot come from training on it.  Zeroing the tail "
            "mean so the packed-obs update path stays exact.",
            stacklevel=3)
        import jax.numpy as jnp
        mean = ap.obs_rms.mean.at[C.OBS_USED:].set(
            jnp.zeros_like(ap.obs_rms.mean[C.OBS_USED:]))
        ap = ap.replace(obs_rms=ap.obs_rms.replace(mean=mean))
    return ap


def load_agent(path: str, template: Optional[AgentParams] = None
               ) -> AgentParams:
    if template is None:
        _, template = init_agent(jax.random.PRNGKey(0))
    if path.endswith((".pth", ".pt")):
        # reference-format PyTorch checkpoint (scripts/ppo.py:337-350)
        from .torch_compat import load_torch_agent
        ap = load_torch_agent(path)
        got = jax.tree_util.tree_map(lambda x: x.shape, ap.params)
        want = jax.tree_util.tree_map(lambda x: x.shape, template.params)
        if got != want:
            raise ValueError(
                f"{path}: imported architecture does not match this "
                f"framework's ActorCritic — imported {got}, expected "
                f"{want}")
        return _check_obs_tail(ap, path)
    with open(path, "rb") as f:
        return _check_obs_tail(
            serialization.from_bytes(template, f.read()), path)


def checkpoint_path(model_name: str, iteration: int,
                    root: str = "checkpoints") -> str:
    return os.path.join(root, model_name, f"{model_name}_{iteration}.ckpt")


# ---- full train-state checkpoints (Orbax) ----

def save_train_state(ts, path: str):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(ts), force=True)
    ckptr.wait_until_finished()


def restore_train_state(template, path: str):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
