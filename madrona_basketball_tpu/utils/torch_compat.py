"""Import reference PyTorch checkpoints.

The reference saves `torch.save(agent.state_dict())` every N iterations
(scripts/ppo.py:337-350); its `Agent` is Sequential(Linear, LayerNorm,
ReLU) x num_layers + actor/critic Linear heads + two RunningMeanStd
modules with float64 buffers (scripts/agent.py:107-137, 19-26).  This
module converts such a .pth state_dict into this framework's
`AgentParams`, so models trained with the reference stack migrate
directly (same math: see models/agent.py / models/normalize.py).

Key mapping:
    backbone.{3k}.weight  (out,in) -> params['Dense_k']['kernel'] (in,out)
    backbone.{3k}.bias             -> params['Dense_k']['bias']
    backbone.{3k+1}.weight/bias    -> params['LayerNorm_k']['scale'/'bias']
    actor.weight/bias              -> params['Dense_L']   (logits head)
    critic.weight/bias             -> params['Dense_L+1'] (value head)
    obs_norm.mean/var/count   (f64)-> obs_rms   (f32)
    value_norm.mean/var/count (f64)-> value_rms (f32)

torch is only imported inside the loader, keeping it an optional
dependency of the framework.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.agent import AgentParams
from ..models.normalize import RMSState

F32 = jnp.float32


def _to_np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach")
                      else t)


def agent_params_from_torch_state_dict(sd: dict) -> AgentParams:
    """Convert a reference `Agent.state_dict()` (tensors or arrays) into
    AgentParams."""
    sd = {k: _to_np(v) for k, v in sd.items()}
    n_linears = sorted({int(k.split(".")[1]) for k in sd
                        if k.startswith("backbone.") and
                        k.endswith(".weight") and
                        sd[k].ndim == 2})
    params = {}
    for li, idx in enumerate(n_linears):
        params[f"Dense_{li}"] = {
            "kernel": jnp.asarray(sd[f"backbone.{idx}.weight"].T, F32),
            "bias": jnp.asarray(sd[f"backbone.{idx}.bias"], F32),
        }
        params[f"LayerNorm_{li}"] = {
            "scale": jnp.asarray(sd[f"backbone.{idx + 1}.weight"], F32),
            "bias": jnp.asarray(sd[f"backbone.{idx + 1}.bias"], F32),
        }
    L = len(n_linears)
    params[f"Dense_{L}"] = {
        "kernel": jnp.asarray(sd["actor.weight"].T, F32),
        "bias": jnp.asarray(sd["actor.bias"], F32),
    }
    params[f"Dense_{L + 1}"] = {
        "kernel": jnp.asarray(sd["critic.weight"].T, F32),
        "bias": jnp.asarray(sd["critic.bias"], F32),
    }

    def rms(prefix):
        return RMSState(
            mean=jnp.asarray(sd[f"{prefix}.mean"], F32),
            var=jnp.asarray(sd[f"{prefix}.var"], F32),
            count=jnp.asarray(sd[f"{prefix}.count"], F32),
        )

    return AgentParams(params={"params": params},
                       obs_rms=rms("obs_norm"),
                       value_rms=rms("value_norm"))


def load_torch_agent(path: str) -> AgentParams:
    """Load a reference `.pth` checkpoint (torch.save of a state_dict)."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return agent_params_from_torch_state_dict(sd)


def torch_state_dict_from_agent_params(ap: AgentParams) -> dict:
    """The inverse mapping: AgentParams -> a reference-format state_dict
    (numpy values; feed to torch.nn.Module.load_state_dict after
    tensor-ifying, or torch.save directly).  Enables (a) initializing the
    cross-check torch trainer from the exact flax weights and (b)
    exporting checkpoints trained here back to the reference stack."""
    pp = ap.params["params"]
    dense = sorted(int(k.split("_")[1]) for k in pp if k.startswith("Dense"))
    n_backbone = len([k for k in pp if k.startswith("LayerNorm")])
    sd = {}
    for li in range(n_backbone):
        sd[f"backbone.{3 * li}.weight"] = np.asarray(
            pp[f"Dense_{li}"]["kernel"]).T.copy()
        sd[f"backbone.{3 * li}.bias"] = np.asarray(
            pp[f"Dense_{li}"]["bias"])
        sd[f"backbone.{3 * li + 1}.weight"] = np.asarray(
            pp[f"LayerNorm_{li}"]["scale"])
        sd[f"backbone.{3 * li + 1}.bias"] = np.asarray(
            pp[f"LayerNorm_{li}"]["bias"])
    actor, critic = dense[-2], dense[-1]
    sd["actor.weight"] = np.asarray(pp[f"Dense_{actor}"]["kernel"]).T.copy()
    sd["actor.bias"] = np.asarray(pp[f"Dense_{actor}"]["bias"])
    sd["critic.weight"] = np.asarray(pp[f"Dense_{critic}"]["kernel"]).T.copy()
    sd["critic.bias"] = np.asarray(pp[f"Dense_{critic}"]["bias"])
    for prefix, rms in (("obs_norm", ap.obs_rms),
                        ("value_norm", ap.value_rms)):
        sd[f"{prefix}.mean"] = np.asarray(rms.mean, np.float64)
        sd[f"{prefix}.var"] = np.asarray(rms.var, np.float64)
        sd[f"{prefix}.count"] = np.asarray(rms.count, np.float64)
    return sd
