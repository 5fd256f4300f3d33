"""Manager-equivalent tensor export.

Named accessors over the batched state with the same logical shapes as the
reference's 18 zero-copy tensor views (src/mgr.cpp:315-445, bound in
src/bindings.cpp:65-100).  Being `jax.Array` views of the state pytree they
are already "exported" — no copy happens until the host asks.

Dtype policy: the reference bit-reinterprets several float fields as int32
and vice versa (GameState's five int fields exported through a float tensor,
Team.teamColor floats through an int tensor, Stats floats through an int
tensor — src/mgr.cpp:323-327, 392-403).  Downstream consumers (viewer,
src/constants.py EVENT_DEFINITIONS) index these positionally and the
garbled values are effectively unused, so this export produces *value-cast*
(not bit-cast) fields; `bitcast_compat=True` reproduces the raw bit patterns
for byte-level fixture comparison.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constants as C
from .state import State

F32 = jnp.float32
I32 = jnp.int32


def game_state_tensor(s: State) -> jax.Array:
    """(W, 14) float32 — field order of src/types.hpp:46-67."""
    g = s.game
    cols = [
        g.inbounding_in_progress.astype(F32),
        g.live_ball.astype(F32),
        g.period,
        g.team_in_possession,
        g.team0_hoop.astype(F32),
        g.team0_score,
        g.team1_hoop.astype(F32),
        g.team1_score,
        g.game_clock,
        g.shot_clock,
        g.scored_baskets,
        g.oob_count,
        g.inbound_clock,
        g.is_one_on_one.astype(F32),
    ]
    return jnp.stack(cols, axis=-1)


def export_tensors(s: State, bitcast_compat: bool = False) -> dict:
    """All reference tensors, keyed by their binding names (sans `_tensor`)."""
    a, b, h = s.agents, s.ball, s.hoops
    W = a.pos.shape[0]

    def bits_f2i(x):
        return jax.lax.bitcast_convert_type(x, I32)

    team_color = bits_f2i(a.team_color) if bitcast_compat \
        else a.team_color.astype(I32)
    stats = jnp.stack([a.stat_points, a.stat_fouls], axis=-1)
    stats = bits_f2i(stats) if bitcast_compat else stats.astype(I32)

    gs = game_state_tensor(s)
    if bitcast_compat:
        g = s.game
        i2f = lambda x: jax.lax.bitcast_convert_type(x, F32)  # noqa: E731
        gs = gs.at[:, 0].set(i2f(g.inbounding_in_progress))
        gs = gs.at[:, 1].set(i2f(g.live_ball))
        gs = gs.at[:, 4].set(i2f(g.team0_hoop))
        gs = gs.at[:, 6].set(i2f(g.team1_hoop))
        gs = gs.at[:, 13].set(i2f(g.is_one_on_one))

    return {
        # ---- general ----
        "reset": a.reset[..., None],                       # (W, A, 1) i32
        "game_state": gs,                                  # (W, 14)
        # ---- agents ----
        "action": a.action,                                # (W, A, 6) i32
        "action_mask": a.action_mask,                      # (W, A, 4) i32
        "observations": a.obs,                             # (W, A, 128) f32
        "reward": a.reward,                                # (W, A) f32
        "done": a.done,                                    # (W, A) f32
        "agent_pos": a.pos,                                # (W, A, 3) f32
        "orientation": a.orient,                           # (W, A, 4) f32
        "agent_possession": jnp.stack(
            [a.has_ball, a.held_ball_id, a.points_worth], axis=-1),
        "agent_team": jnp.concatenate(
            [a.team[..., None], team_color,
             a.defending_hoop[..., None]], axis=-1),       # (W, A, 5) i32
        "agent_stats": stats,                              # (W, A, 2)
        "agent_entity_id": jnp.broadcast_to(
            jnp.array(C.AGENT_IDS, I32), (W, len(C.AGENT_IDS))),
        # ---- ball ----
        "basketball_pos": b.pos[:, None, :],               # (W, 1, 3) f32
        "ball_physics": jnp.stack(
            [b.in_flight, b.last_touched_agent, b.last_touched_team,
             b.shot_by_agent, b.shot_by_team, b.shot_point_value,
             b.shot_going_in], axis=-1)[:, None, :],       # (W, 1, 7) i32
        "ball_grabbed": jnp.stack(
            [b.grabbed, b.holder], axis=-1)[:, None, :],   # (W, 1, 2) i32
        "ball_velocity": b.vel[:, None, :],                # (W, 1, 3) f32
        "ball_entity_id": jnp.full((W, 1), C.BALL_ID, I32),
        # ---- hoops ----
        "hoop_pos": h.pos,                                 # (W, H, 3) f32
    }
