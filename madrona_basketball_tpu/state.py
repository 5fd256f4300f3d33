"""Simulation state as a structured JAX pytree.

Replaces the reference's ECS component storage (src/types.hpp:46-263) with a
struct-of-arrays dataclass pytree.  Entity counts are compile-time constants
(src/constants.hpp:5-7, entities are never created/destroyed after init), so
each component column is a fixed-shape array; a *single world's* state has no
leading world axis — batching is `jax.vmap` over the whole pytree, and
multi-chip scaling is sharding of that world axis.

Dtypes are kept honest (int fields are int32, float fields float32); the
reference's bit-reinterpretation quirks in its tensor export (src/mgr.cpp
game_state/team/stats int-as-float views) are handled in `export.py`, not
here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import constants as C
from .config import SimConfig

I32 = jnp.int32
F32 = jnp.float32


@struct.dataclass
class Agents:
    """Per-agent component columns, shape (A, ...) (src/types.hpp:225-242)."""

    pos: jax.Array            # (A, 3) f32 — Position
    vel: jax.Array            # (A, 3) f32 — Velocity (m/s)
    orient: jax.Array         # (A, 4) f32 — Orientation quat (w, x, y, z)
    action: jax.Array         # (A, 6) i32 — move, moveAngle, rotate, grab, pass, shoot
    action_mask: jax.Array    # (A, 4) i32 — can_move, can_grab, can_pass, can_shoot
    reset: jax.Array          # (A,) i32 — externally written Reset flag
    reward: jax.Array         # (A,) f32
    done: jax.Array           # (A,) f32 — float dones, like the reference
    cur_step: jax.Array       # (A,) i32
    has_ball: jax.Array       # (A,) i32 — InPossession.hasBall
    held_ball_id: jax.Array   # (A,) i32 — InPossession.ballEntityID
    points_worth: jax.Array   # (A,) i32 — InPossession.pointsWorth
    im_inbounding: jax.Array  # (A,) i32 — Inbounding.imInbounding
    allowed_to_move: jax.Array  # (A,) i32 — Inbounding.allowedToMove (written, never read)
    team: jax.Array           # (A,) i32 — Team.teamIndex
    team_color: jax.Array     # (A, 3) f32 — Team.teamColor
    defending_hoop: jax.Array  # (A,) i32 — Team.defendingHoopID
    grab_cooldown: jax.Array  # (A,) f32
    stat_points: jax.Array    # (A,) f32 — Stats.points
    stat_fouls: jax.Array     # (A,) f32 — Stats.fouls
    max_speed: jax.Array      # (A,) f32 — Attributes.maxSpeed
    quickness: jax.Array      # (A,) f32
    shooting: jax.Array       # (A,) f32
    ft_pct: jax.Array         # (A,) f32 — freeThrowPercentage
    reaction_speed: jax.Array  # (A,) f32
    target_pos: jax.Array     # (A, 3) f32 — Attributes.currentTargetPosition
    shot_pct: jax.Array       # (A,) f32 — Attributes.currentShotPercentage
    obs: jax.Array            # (A, 128) f32 — Observations


@struct.dataclass
class Ball:
    """The single basketball's components (src/types.hpp:244-253)."""

    pos: jax.Array            # (3,) f32
    vel: jax.Array            # (3,) f32 — displacement per step, not m/s (src/game.cpp:104-106)
    grabbed: jax.Array        # () i32 — Grabbed.isGrabbed
    holder: jax.Array         # () i32 — Grabbed.holderEntityID
    in_flight: jax.Array      # () i32
    last_touched_agent: jax.Array  # () i32
    last_touched_team: jax.Array   # () i32
    shot_by_agent: jax.Array  # () i32
    shot_by_team: jax.Array   # () i32
    shot_point_value: jax.Array    # () i32
    shot_going_in: jax.Array  # () i32 — decided at release (src/game.cpp:348-355)
    reset: jax.Array          # () i32
    done: jax.Array           # () f32
    cur_step: jax.Array       # () i32


@struct.dataclass
class Hoops:
    """Per-hoop component columns, shape (H, ...) (src/types.hpp:255-263)."""

    pos: jax.Array           # (H, 3) f32
    zone_radius: jax.Array   # (H,) f32 — ScoringZone.radius
    zone_height: jax.Array   # (H,) f32 — ScoringZone.height
    zone_center: jax.Array   # (H, 3) f32 — ScoringZone.center
    reset: jax.Array         # (H,) i32
    done: jax.Array          # (H,) f32
    cur_step: jax.Array      # (H,) i32


@struct.dataclass
class GameState:
    """The GameState singleton (src/types.hpp:46-67), honest dtypes."""

    inbounding_in_progress: jax.Array  # () i32
    live_ball: jax.Array               # () i32
    period: jax.Array                  # () f32
    team_in_possession: jax.Array      # () f32 (float in the reference)
    team0_hoop: jax.Array              # () i32 — entity id
    team0_score: jax.Array             # () f32
    team1_hoop: jax.Array              # () i32
    team1_score: jax.Array             # () f32
    game_clock: jax.Array              # () f32
    shot_clock: jax.Array              # () f32
    scored_baskets: jax.Array          # () f32
    oob_count: jax.Array               # () f32 — outOfBoundsCount
    inbound_clock: jax.Array           # () f32
    is_one_on_one: jax.Array           # () i32


@struct.dataclass
class State:
    """One world's full simulation state + its RNG key."""

    agents: Agents
    ball: Ball
    hoops: Hoops
    game: GameState
    reset_now: jax.Array  # () i32 — the WorldClock singleton (src/types.hpp:69-71)
    key: jax.Array        # jax PRNG key


def zero_state(cfg: SimConfig, key: jax.Array) -> State:
    """Allocate an all-zero state skeleton.  `engine.generate_world` fills it."""
    A, H = cfg.num_agents, cfg.num_hoops
    agents = Agents(
        pos=jnp.zeros((A, 3), F32),
        vel=jnp.zeros((A, 3), F32),
        orient=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0], F32), (A, 1)),
        action=jnp.zeros((A, 6), I32),
        action_mask=jnp.zeros((A, 4), I32),
        reset=jnp.zeros((A,), I32),
        reward=jnp.zeros((A,), F32),
        done=jnp.zeros((A,), F32),
        cur_step=jnp.zeros((A,), I32),
        has_ball=jnp.zeros((A,), I32),
        held_ball_id=jnp.full((A,), C.ENTITY_ID_PLACEHOLDER, I32),
        points_worth=jnp.full((A,), 2, I32),
        im_inbounding=jnp.zeros((A,), I32),
        allowed_to_move=jnp.ones((A,), I32),
        team=jnp.arange(A, dtype=I32) % 2,
        team_color=jnp.zeros((A, 3), F32),
        defending_hoop=jnp.zeros((A,), I32),
        grab_cooldown=jnp.zeros((A,), F32),
        stat_points=jnp.zeros((A,), F32),
        stat_fouls=jnp.zeros((A,), F32),
        max_speed=jnp.zeros((A,), F32),
        quickness=jnp.zeros((A,), F32),
        shooting=jnp.zeros((A,), F32),
        ft_pct=jnp.zeros((A,), F32),
        reaction_speed=jnp.zeros((A,), F32),
        target_pos=jnp.zeros((A, 3), F32),
        shot_pct=jnp.zeros((A,), F32),
        obs=jnp.zeros((A, C.OBS_SIZE), F32),
    )
    ball = Ball(
        pos=jnp.zeros((3,), F32),
        vel=jnp.zeros((3,), F32),
        grabbed=jnp.zeros((), I32),
        holder=jnp.array(C.ENTITY_ID_PLACEHOLDER, I32),
        in_flight=jnp.zeros((), I32),
        last_touched_agent=jnp.array(C.ENTITY_ID_PLACEHOLDER, I32),
        last_touched_team=jnp.array(C.ENTITY_ID_PLACEHOLDER, I32),
        shot_by_agent=jnp.array(C.ENTITY_ID_PLACEHOLDER, I32),
        shot_by_team=jnp.array(C.ENTITY_ID_PLACEHOLDER, I32),
        shot_point_value=jnp.array(2, I32),
        shot_going_in=jnp.zeros((), I32),
        reset=jnp.zeros((), I32),
        done=jnp.zeros((), F32),
        cur_step=jnp.zeros((), I32),
    )
    hoops = Hoops(
        pos=jnp.zeros((H, 3), F32),
        zone_radius=jnp.full((H,), C.HOOP_SCORE_ZONE_SIZE, F32),
        zone_height=jnp.full((H,), 0.1, F32),
        zone_center=jnp.zeros((H, 3), F32),
        reset=jnp.zeros((H,), I32),
        done=jnp.zeros((H,), F32),
        cur_step=jnp.zeros((H,), I32),
    )
    game = GameState(
        inbounding_in_progress=jnp.zeros((), I32),
        live_ball=jnp.ones((), I32),
        period=jnp.ones((), F32),
        team_in_possession=jnp.zeros((), F32),
        team0_hoop=jnp.array(C.HOOP_IDS[0], I32),
        team0_score=jnp.zeros((), F32),
        team1_hoop=jnp.array(C.HOOP_IDS[1], I32),
        team1_score=jnp.zeros((), F32),
        game_clock=jnp.array(cfg.time_per_period, F32),
        shot_clock=jnp.array(cfg.shot_clock_duration, F32),
        scored_baskets=jnp.zeros((), F32),
        oob_count=jnp.zeros((), F32),
        inbound_clock=jnp.zeros((), F32),
        is_one_on_one=jnp.array(1 if cfg.one_on_one else 0, I32),
    )
    return State(
        agents=agents,
        ball=ball,
        hoops=hoops,
        game=game,
        reset_now=jnp.zeros((), I32),
        key=key,
    )


def tree_select(pred: jax.Array, on_true, on_false):
    """Elementwise `where` over two identical pytrees with a scalar predicate.

    Used to merge the pure-functional `reset_world` result into the live state
    per world (replacing the in-place `resetWorld(ctx)` call at
    src/game.cpp:963).  RNG keys (uint32 typed keys) are selected too.
    """

    def sel(t, f):
        return jnp.where(pred, t, f) if t.ndim == 0 else jnp.where(
            jnp.reshape(pred, (1,) * t.ndim), t, f)

    return jax.tree.map(sel, on_true, on_false)


def np_placeholder() -> np.int32:
    return np.int32(C.ENTITY_ID_PLACEHOLDER)
