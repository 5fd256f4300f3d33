"""madrona_basketball_tpu — a TPU-native batched basketball / 1v1-tag RL
framework.

A from-scratch JAX/XLA re-design with the capabilities of the reference
Madrona-ECS C++/CUDA simulator + PyTorch PPO stack (davidj24/
madrona_basketball): the 18-system game step becomes branchless masked array
math over a structured state pytree, stepped in lockstep across thousands of
worlds under jit/vmap, with an on-device PPO actor-learner and self-play
league on top.
"""

from . import constants
from .config import DEFAULT_CONFIG, SimConfig
from .engine import (generate_world, init_batch, make_step_fn, reset_world,
                     step, step_batch)
from .state import State

__version__ = "0.1.0"

__all__ = [
    "constants",
    "SimConfig",
    "DEFAULT_CONFIG",
    "State",
    "generate_world",
    "reset_world",
    "step",
    "step_batch",
    "init_batch",
    "make_step_fn",
]
