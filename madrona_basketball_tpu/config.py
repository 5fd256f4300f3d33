"""Static simulation configuration.

One typed config replaces the reference's scattered compile-time switches:
`ONE_ON_ONE` (src/constants.hpp:27), the hand-edited "FOR TAG" code blocks
(src/game.cpp:525-532, 622-631, 861-863), `Manager::Config`/`Sim::Config`
(src/mgr.hpp:19-25, src/sim.hpp:17-21), and the grid geometry baked into the
bindings (src/bindings.cpp:28-51).

`SimConfig` is a frozen (hashable) dataclass so it can be passed as a static
argument to `jax.jit` — every field is a Python scalar that shapes the traced
computation, not a traced value.
"""

from __future__ import annotations

import dataclasses

from . import constants as C


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Compile-time simulation parameters (shapes the jitted step)."""

    num_agents: int = C.NUM_AGENTS
    num_balls: int = C.NUM_BASKETBALLS
    num_hoops: int = C.NUM_HOOPS

    # Game-mode switches.
    # `one_on_one` maps to GameState.isOneOnOne (src/constants.hpp:27); the
    # is-1v1 branches also exist at runtime via the state field, this sets the
    # initial value.
    one_on_one: bool = True
    # `tag_mode` gates the hand-edited "FOR TAG" overrides that the snapshot
    # has active: pass/grab masked off unconditionally (src/game.cpp:525-528)
    # and the collision tag-reward + reset block (src/game.cpp:622-631).
    tag_mode: bool = True

    # Clocks (seconds).
    time_per_period: float = C.TIME_PER_PERIOD
    shot_clock_duration: float = C.SHOT_CLOCK_DURATION
    sim_dt: float = C.TIMESTEPS_TO_SECONDS_FACTOR

    # World grid (continuous clamp extents + spawn point); the wall-occupancy
    # grid is all-empty in the reference (src/bindings.cpp:7-12) so no cell
    # map is carried — wall tests are compiled out.
    grid_width: float = C.GRID_WIDTH_M
    grid_height: float = C.GRID_HEIGHT_M
    start_x: float = C.START_X
    start_y: float = C.START_Y

    # Unused by sim logic, kept for API parity (scripts/env.py:30).
    max_episode_length: int = 39600

    def __post_init__(self):
        if self.num_agents != 2 or self.num_balls != 1 or self.num_hoops != 2:
            raise ValueError(
                "The rule set is specified for 2 agents / 1 ball / 2 hoops "
                "(reference src/constants.hpp:5-7); other counts would "
                "overflow the 128-float observation layout "
                "(src/game.cpp:1455)."
            )


DEFAULT_CONFIG = SimConfig()
