"""The game step: 19 systems as pure, branchless JAX functions.

Each function re-expresses one reference system (src/game.cpp) as masked
array math over the structured state pytree.  The reference chains the
systems in a strictly linear taskgraph (src/game.cpp:1463-1526), so system
k+1 observes system k's writes within the same step — reproduced here by
threading the state through function composition.

Where the reference's `ParallelForNode`s perform unsynchronized cross-entity
writes (grab steals, SAT collision correction, inbounder assignment), the
iteration order of the single-threaded CPU executor (agent index order,
ball/hoop index order) is adopted as the *defined* semantics; loops over the
2 agents / 2 hoops are unrolled at trace time, so XLA still fuses the whole
chain into one vectorized program over the world axis.

All C++ early-returns become predicate masks applied through `jnp.where`;
every conditional RNG draw of the reference becomes an unconditional
pre-drawn uniform (see `StepNoise`) multiplied by its activation mask, which
preserves the per-event sampling distribution exactly (bit-level stream
parity with madrona's RNG is impossible — the engine submodule is absent
from the snapshot).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import constants as C
from .config import SimConfig
from .maths import (find_rotation_between_vectors, length, length2,
                    normalize_unsafe, quat_angle_axis, quat_mul, quat_rotate)
from .state import State

F32 = jnp.float32
I32 = jnp.int32
PLACEHOLDER = C.ENTITY_ID_PLACEHOLDER
FWD = np.array([0.0, 1.0, 0.0], np.float32)  # AGENT_BASE_FORWARD (src/constants.hpp:54)
# (numpy, not jnp: module-level jnp constants initialize the XLA
# backend at import, which breaks jax.distributed.initialize)


@struct.dataclass
class StepNoise:
    """Pre-drawn uniforms consumed by one step.

    shot_u:  (A, 3) in [-1, 1) — distance/defender/velocity shot deviations
             (src/game.cpp:309,331,339).
    reset_u: (3,) — [0], [1] in [-1, 1): offense spawn x/y deviation;
             [2] in [0, 1): defender spawn angle (src/helper.cpp:121-132).
    """

    shot_u: jax.Array
    reset_u: jax.Array


def draw_noise(cfg: SimConfig, key: jax.Array) -> StepNoise:
    k1, k2 = jax.random.split(key)
    shot_u = jax.random.uniform(k1, (cfg.num_agents, 3), F32, -1.0, 1.0)
    reset_xy = jax.random.uniform(k2, (3,), F32, 0.0, 1.0)
    reset_u = jnp.array([reset_xy[0] * 2.0 - 1.0,
                         reset_xy[1] * 2.0 - 1.0,
                         reset_xy[2]])
    return StepNoise(shot_u=shot_u, reset_u=reset_u)


# =====================================================================
# Shared helpers (src/helper.cpp)
# =====================================================================

def find_vector_to_center(cfg: SimConfig, pos: jax.Array) -> jax.Array:
    """Unit vector from pos toward the grid start point (src/helper.cpp:44-48)."""
    center = jnp.array([cfg.start_x, cfg.start_y, 0.0], F32)
    return normalize_unsafe(center - pos)


def get_shot_point_value(pos: jax.Array, hoop_zone_center: jax.Array) -> jax.Array:
    """2 vs 3 point classification incl. corner-3 geometry (src/helper.cpp:50-81)."""
    distance = length(pos - hoop_zone_center)
    in_corner_lane = (
        (pos[1] < C.COURT_MIN_Y + C.CORNER_3_FROM_SIDELINE_M)
        | (pos[1] > C.COURT_MIN_Y + C.COURT_WIDTH_M - C.CORNER_3_FROM_SIDELINE_M)
    )
    left_hoop = hoop_zone_center[0] < C.WORLD_WIDTH_M / 2.0
    corner3 = in_corner_lane & jnp.where(
        left_hoop,
        pos[0] <= C.COURT_MIN_X + C.CORNER_3_LENGTH_FROM_BASELINE_M,
        pos[0] >= C.COURT_MIN_X + C.COURT_LENGTH_M - C.CORNER_3_LENGTH_FROM_BASELINE_M,
    )
    arc3 = distance >= C.ARC_RADIUS_M
    return jnp.where(corner3 | arc3, 3, 2).astype(I32)


def assign_inbounder(cfg: SimConfig, s: State, active, new_team_idx,
                     ball_spot, new_orientation, is_oob: bool) -> State:
    """Give the ball to the first player of `new_team_idx` for an inbound
    (src/game.cpp:14-53).  `active` masks the whole operation per world."""
    a, b, g = s.agents, s.ball, s.game
    assigned = jnp.zeros((), jnp.bool_)
    for i in range(cfg.num_agents):
        take = active & (a.team[i] == new_team_idx) & (~assigned)
        a = a.replace(
            im_inbounding=a.im_inbounding.at[i].set(
                jnp.where(take, 1, a.im_inbounding[i])),
            pos=a.pos.at[i].set(jnp.where(take, ball_spot, a.pos[i])),
            has_ball=a.has_ball.at[i].set(jnp.where(take, 1, a.has_ball[i])),
            held_ball_id=a.held_ball_id.at[i].set(
                jnp.where(take, C.BALL_ID, a.held_ball_id[i])),
            orient=a.orient.at[i].set(
                jnp.where(take, new_orientation, a.orient[i])),
        )
        b = b.replace(
            grabbed=jnp.where(take, 1, b.grabbed),
            holder=jnp.where(take, C.AGENT_IDS[i], b.holder),
        )
        assigned = assigned | take

    found = active & assigned
    g = g.replace(
        team_in_possession=jnp.where(
            found, new_team_idx.astype(F32), g.team_in_possession),
        inbounding_in_progress=jnp.where(found, 1, g.inbounding_in_progress),
        inbound_clock=jnp.where(found, 5.0, g.inbound_clock),
        oob_count=g.oob_count + jnp.where(found & is_oob, 1.0, 0.0),
    )
    return s.replace(agents=a, ball=b, game=g)


# =====================================================================
# 1. tick (src/game.cpp:969-988)
# =====================================================================

def tick_system(cfg: SimConfig, s: State) -> State:
    a = s.agents
    was_reset = a.reset == 1
    a = a.replace(
        reward=jnp.zeros_like(a.reward),
        done=jnp.where(was_reset, 1.0, 0.0).astype(F32),
        cur_step=jnp.where(was_reset, 0, a.cur_step + 1),
        grab_cooldown=jnp.maximum(0.0, a.grab_cooldown - 1.0),
    )
    return s.replace(agents=a)


# =====================================================================
# 2. actionMaskSystem (src/game.cpp:489-533)
# =====================================================================

def action_mask_system(cfg: SimConfig, s: State) -> State:
    a, g = s.agents, s.game
    can_move = jnp.ones_like(a.team)
    can_grab = jnp.ones_like(a.team)
    can_pass = jnp.where(a.has_ball == 1, 1, 0)
    can_shoot = jnp.where(a.has_ball == 1, 1, 0)

    inb = g.inbounding_in_progress == 1
    can_shoot = jnp.where(inb, 0, can_shoot)
    can_grab = jnp.where(inb, 0, can_grab)
    pinned = inb & (a.im_inbounding == 1) & (g.live_ball == 0)
    can_move = jnp.where(pinned, 0, can_move)

    can_grab = jnp.where(a.grab_cooldown > 0.0, 0, can_grab)

    if cfg.tag_mode:
        # ======================== FOR TAG (src/game.cpp:525-528) =========
        can_pass = jnp.zeros_like(can_pass)
        can_grab = jnp.zeros_like(can_grab)

    mask = jnp.stack([can_move, can_grab, can_pass, can_shoot], axis=-1)
    return s.replace(agents=a.replace(action_mask=mask.astype(I32)))


# =====================================================================
# 3. moveAgentSystem (src/game.cpp:410-486)
# =====================================================================

def move_agent_system(cfg: SimConfig, s: State) -> State:
    a = s.agents
    dt = cfg.sim_dt

    new_orients, new_pos, new_vel = [], [], []
    for i in range(cfg.num_agents):
        act = a.action[i]
        orient = a.orient[i]

        # Rotation applies even when movement is masked off.
        do_rot = act[2] != 0
        turn_angle = jnp.where(act[2] == 1, jnp.pi / 180.0 * 6.0,
                               -jnp.pi / 180.0 * 6.0).astype(F32)
        turn = quat_angle_axis(turn_angle, jnp.array([0.0, 0.0, 1.0], F32))
        orient = jnp.where(do_rot, quat_mul(turn, orient), orient)

        active = a.action_mask[i, 0] != 0

        move_angle = act[1].astype(F32) * C.ANGLE_BETWEEN_DIRECTIONS
        delta_vel = jnp.stack([jnp.sin(move_angle), -jnp.cos(move_angle),
                               jnp.zeros((), F32)])
        delta_vel = delta_vel * a.quickness[i] * act[0].astype(F32)

        vel = a.vel[i]
        max_speed = a.max_speed[i]
        orient_vec = quat_rotate(orient, FWD)
        vlen2 = length2(vel)
        safe_inv = jax.lax.rsqrt(jnp.maximum(vlen2, 1e-30))
        dot = jnp.where(vlen2 > 1e-6, jnp.sum(vel * safe_inv * orient_vec), 0.0)

        backwards = dot < -0.1
        sideways = (~backwards) & (dot <= 0.8)
        max_speed = max_speed * jnp.where(backwards, 0.1,
                                          jnp.where(sideways, 0.7, 1.0))
        delta_vel = delta_vel * jnp.where(backwards | sideways, 0.1, 1.0)

        vel = vel + delta_vel
        # (The reference zeroes delta_vel.x for the inbounder *after* the
        #  add — dead code, reproduced as a no-op; src/game.cpp:454.)
        max_speed = max_speed * jnp.where(a.has_ball[i] == 1,
                                          C.BALL_AGENT_SLOWDOWN, 1.0)
        speed = length(vel)
        vel = jnp.where(speed > max_speed,
                        vel * (max_speed / jnp.maximum(speed, 1e-30)), vel)

        new_x = jnp.clip(a.pos[i, 0] + vel[0] * dt, 0.0, cfg.grid_width)
        new_y = jnp.clip(a.pos[i, 1] + vel[1] * dt, 0.0, cfg.grid_height)
        # Wall-cell test compiled out: every cell is empty (src/bindings.cpp:7-12).
        pos = jnp.where(active,
                        jnp.stack([new_x, new_y, a.pos[i, 2]]), a.pos[i])
        vel = jnp.where(active, vel * 0.95, a.vel[i])

        new_orients.append(orient)
        new_pos.append(pos)
        new_vel.append(vel)

    a = a.replace(orient=jnp.stack(new_orients), pos=jnp.stack(new_pos),
                  vel=jnp.stack(new_vel))
    return s.replace(agents=a)


# =====================================================================
# 4. grabSystem (src/game.cpp:164-239)
# =====================================================================

def grab_system(cfg: SimConfig, s: State) -> State:
    for i in range(cfg.num_agents):
        s = _grab_one(cfg, s, i)
    return s


def _grab_one(cfg: SimConfig, s: State, i: int) -> State:
    a, b, g = s.agents, s.ball, s.game
    aid = C.AGENT_IDS[i]

    act = (a.action_mask[i, 1] != 0) & (a.action[i, 3] != 0)
    a = a.replace(
        grab_cooldown=a.grab_cooldown.at[i].set(
            jnp.where(act, 10.0, a.grab_cooldown[i])),
        action=a.action.at[i, 3].set(
            jnp.where(act, 0, a.action[i, 3])),
    )

    ball_act = act & (b.in_flight != 1)
    holding = (a.has_ball[i] == 1) & (b.grabbed == 1) & (b.holder == aid)

    # Toggle-drop if already holding (src/game.cpp:190-196).
    drop = ball_act & holding
    a = a.replace(
        has_ball=a.has_ball.at[i].set(jnp.where(drop, 0, a.has_ball[i])),
        held_ball_id=a.held_ball_id.at[i].set(
            jnp.where(drop, PLACEHOLDER, a.held_ball_id[i])),
    )
    b = b.replace(
        grabbed=jnp.where(drop, 0, b.grabbed),
        holder=jnp.where(drop, PLACEHOLDER, b.holder),
    )

    near = length(b.pos - a.pos[i]) <= 0.3
    reach = ball_act & (~holding) & near

    # 1v1: a defender touching the ball is a turnover -> episode reset
    # (src/game.cpp:204-207).
    turnover = reach & (g.is_one_on_one == 1) & (
        a.team[i].astype(F32) != g.team_in_possession)
    reset_now = jnp.where(turnover, 1, s.reset_now)

    take = reach & (~turnover)
    # Steal: strip any current holder, 1-second cooldown for the victim
    # (src/game.cpp:210-221).
    for j in range(cfg.num_agents):
        victim = take & (a.held_ball_id[j] == C.BALL_ID)
        a = a.replace(
            has_ball=a.has_ball.at[j].set(jnp.where(victim, 0, a.has_ball[j])),
            held_ball_id=a.held_ball_id.at[j].set(
                jnp.where(victim, PLACEHOLDER, a.held_ball_id[j])),
            grab_cooldown=a.grab_cooldown.at[j].set(
                jnp.where(victim, C.SIMULATION_HZ, a.grab_cooldown[j])),
        )

    a = a.replace(
        has_ball=a.has_ball.at[i].set(jnp.where(take, 1, a.has_ball[i])),
        held_ball_id=a.held_ball_id.at[i].set(
            jnp.where(take, C.BALL_ID, a.held_ball_id[i])),
    )
    b = b.replace(
        holder=jnp.where(take, aid, b.holder),
        grabbed=jnp.where(take, 1, b.grabbed),
        in_flight=jnp.where(take, 0, b.in_flight),
        vel=jnp.where(take, jnp.zeros(3, F32), b.vel),
        shot_by_agent=jnp.where(take, PLACEHOLDER, b.shot_by_agent),
        shot_by_team=jnp.where(take, PLACEHOLDER, b.shot_by_team),
        shot_point_value=jnp.where(take, 2, b.shot_point_value),
    )
    g = g.replace(
        team_in_possession=jnp.where(
            take, a.team[i].astype(F32), g.team_in_possession),
        live_ball=jnp.where(take, 1, g.live_ball),
    )
    return s.replace(agents=a, ball=b, game=g, reset_now=reset_now)


# =====================================================================
# 5. passSystem (src/game.cpp:243-270)
# =====================================================================

def pass_system(cfg: SimConfig, s: State) -> State:
    for i in range(cfg.num_agents):
        a, b, g = s.agents, s.ball, s.game
        act = (a.action_mask[i, 2] != 0) & (a.action[i, 4] != 0)
        hold = act & (b.holder == C.AGENT_IDS[i])
        a = a.replace(
            has_ball=a.has_ball.at[i].set(jnp.where(hold, 0, a.has_ball[i])),
            held_ball_id=a.held_ball_id.at[i].set(
                jnp.where(hold, PLACEHOLDER, a.held_ball_id[i])),
            im_inbounding=a.im_inbounding.at[i].set(
                jnp.where(hold, 0, a.im_inbounding[i])),
        )
        pass_vel = quat_rotate(a.orient[i], jnp.array([0.0, 0.1, 0.0], F32))
        b = b.replace(
            grabbed=jnp.where(hold, 0, b.grabbed),
            holder=jnp.where(hold, PLACEHOLDER, b.holder),
            vel=jnp.where(hold, pass_vel, b.vel),
        )
        g = g.replace(inbounding_in_progress=jnp.where(
            hold, 0, g.inbounding_in_progress))
        s = s.replace(agents=a, ball=b, game=g)
    return s


# =====================================================================
# 6. shootSystem (src/game.cpp:273-407)
# =====================================================================

def shoot_system(cfg: SimConfig, s: State, noise: StepNoise) -> State:
    for i in range(cfg.num_agents):
        s = _shoot_one(cfg, s, i, noise.shot_u[i])
    return s


def _shoot_one(cfg: SimConfig, s: State, i: int, u: jax.Array) -> State:
    a, b, g, h = s.agents, s.ball, s.game, s.hoops
    aid = C.AGENT_IDS[i]

    act = (a.action_mask[i, 3] != 0) & (a.action[i, 5] != 0)

    # Attacking hoop = the one we're not defending (last match wins,
    # src/game.cpp:290-296).
    zone_center = jnp.zeros(3, F32)
    zone_radius = jnp.zeros((), F32)
    for hi in range(cfg.num_hoops):
        match = C.HOOP_IDS[hi] != a.defending_hoop[i]
        zone_center = jnp.where(match, h.zone_center[hi], zone_center)
        zone_radius = jnp.where(match, h.zone_radius[hi], zone_radius)

    ideal = zone_center - a.pos[i]
    intended = jnp.arctan2(ideal[0], ideal[1])
    dist = length(ideal)

    dev_dist = u[0] * (C.DIST_DEVIATION_PER_METER * dist)

    d_def = jnp.array(jnp.inf, F32)
    for j in range(cfg.num_agents):
        is_def = a.team[j] != a.team[i]
        d_def = jnp.where(is_def,
                          jnp.minimum(d_def, length(a.pos[i] - a.pos[j])),
                          d_def)
    dev_def = jnp.where(
        d_def < 2.0,
        u[1] * (C.DEF_DEVIATION_PER_METER / (d_def + 0.1)), 0.0)

    dev_vel = jnp.where(
        a.action[i, 0] > 0,
        u[2] * (C.VEL_DEVIATION_FACTOR * length(a.vel[i])), 0.0)

    shot_dir = intended + dev_dist + dev_def + dev_vel
    final_vec = jnp.stack([jnp.sin(shot_dir), jnp.cos(shot_dir),
                           jnp.zeros((), F32)])

    # Make decided analytically at release (src/game.cpp:348-355).
    t_along = jnp.sum(ideal * final_vec)
    closest_sq = length2(ideal) - t_along * t_along
    going_in = (~(t_along < 0.0)) & (closest_sq <= zone_radius * zone_radius)

    # Shooter snaps to face the actual shot direction (src/game.cpp:362-364)
    # — gated only on the action, even if the agent isn't the holder.
    snap = find_rotation_between_vectors(FWD, final_vec)
    a = a.replace(orient=a.orient.at[i].set(
        jnp.where(act, snap, a.orient[i])))

    hold = act & (b.holder == aid)
    spv = get_shot_point_value(a.pos[i], zone_center)

    made = hold & going_in
    g = g.replace(scored_baskets=g.scored_baskets + jnp.where(made, 1.0, 0.0))
    a = a.replace(
        reward=a.reward.at[i].add(jnp.where(hold & (~going_in), -1.0, 0.0)),
        has_ball=a.has_ball.at[i].set(jnp.where(hold, 0, a.has_ball[i])),
        held_ball_id=a.held_ball_id.at[i].set(
            jnp.where(hold, PLACEHOLDER, a.held_ball_id[i])),
        im_inbounding=a.im_inbounding.at[i].set(
            jnp.where(hold, 0, a.im_inbounding[i])),
    )
    b = b.replace(
        shot_going_in=jnp.where(made, 1, b.shot_going_in),
        grabbed=jnp.where(hold, 0, b.grabbed),
        holder=jnp.where(hold, PLACEHOLDER, b.holder),
        vel=jnp.where(hold, final_vec * 0.1, b.vel),
        in_flight=jnp.where(hold, 1, b.in_flight),
        shot_by_agent=jnp.where(hold, aid, b.shot_by_agent),
        shot_by_team=jnp.where(hold, a.team[i], b.shot_by_team),
        shot_point_value=jnp.where(hold, spv, b.shot_point_value),
        last_touched_agent=jnp.where(hold, aid, b.last_touched_agent),
        last_touched_team=jnp.where(hold, a.team[i], b.last_touched_team),
    )
    return s.replace(agents=a, ball=b, game=g)


# =====================================================================
# 7. moveBallSystem (src/game.cpp:82-125)
# =====================================================================

def move_ball_system(cfg: SimConfig, s: State) -> State:
    a, b = s.agents, s.ball
    pos = b.pos
    for i in range(cfg.num_agents):
        holding = (a.has_ball[i] == 1) & (b.grabbed == 1) & (
            b.holder == C.AGENT_IDS[i])
        pos = jnp.where(holding, a.pos[i], pos)

    free = (length(b.vel) != 0.0) & (b.grabbed != 1)
    new_pos = jnp.stack([
        jnp.clip(pos[0] + b.vel[0], 0.0, cfg.grid_width),
        jnp.clip(pos[1] + b.vel[1], 0.0, cfg.grid_height),
        pos[2] + b.vel[2],  # z is unclamped (src/game.cpp:110)
    ])
    pos = jnp.where(free, new_pos, pos)
    return s.replace(ball=b.replace(pos=pos))


# =====================================================================
# 8. updateCurrentShotPercentage (src/game.cpp:758-809)
# =====================================================================

def update_shot_pct_system(cfg: SimConfig, s: State) -> State:
    a, h = s.agents, s.hoops
    new_pct = []
    for i in range(cfg.num_agents):
        att_pos = jnp.where(C.HOOP_IDS[0] != a.defending_hoop[i],
                            h.pos[0], h.pos[1])
        dist_hoop = length(att_pos - a.pos[i])
        d_def = jnp.array(jnp.inf, F32)
        for j in range(cfg.num_agents):
            is_def = a.team[j] != a.team[i]
            d_def = jnp.where(is_def,
                              jnp.minimum(d_def, length(a.pos[i] - a.pos[j])),
                              d_def)
        dist_sd = C.DIST_DEVIATION_PER_METER * dist_hoop
        # NB: the reference divides *then* adds 1e-4 (src/game.cpp:799) —
        # different shape than shootSystem's /(d+0.1); kept faithfully.
        def_sd = C.DEF_DEVIATION_PER_METER / d_def + 1e-4
        vel_sd = C.VEL_DEVIATION_FACTOR * length(a.vel[i])
        final_sd = jnp.sqrt(dist_sd * dist_sd / 3.0 + def_sd * def_sd / 3.0 +
                            vel_sd * vel_sd / 3.0)
        max_make_angle = jnp.arctan(C.HOOP_SCORE_ZONE_SIZE / dist_hoop)
        z = max_make_angle / final_sd
        pct = jax.lax.erf(z / jnp.sqrt(jnp.array(2.0, F32)))
        new_pct.append(jnp.where(a.has_ball[i] == 0, 0.0, pct))
    return s.replace(agents=a.replace(shot_pct=jnp.stack(new_pct)))


# =====================================================================
# 9. scoreSystem (src/game.cpp:873-953)
# =====================================================================

def score_system(cfg: SimConfig, s: State) -> State:
    for hi in range(cfg.num_hoops):
        s = _score_one_hoop(cfg, s, hi)
    return s


def _score_one_hoop(cfg: SimConfig, s: State, hi: int) -> State:
    a, b, g, h = s.agents, s.ball, s.game, s.hoops
    hid = C.HOOP_IDS[hi]

    dist_xy = jnp.sqrt((b.pos[0] - h.pos[hi, 0]) ** 2 +
                       (b.pos[1] - h.pos[hi, 1]) ** 2)
    scored = (dist_xy <= h.zone_radius[hi]) & (b.in_flight == 1)
    points = b.shot_point_value

    inb_team = jnp.zeros((), I32)
    for j in range(cfg.num_agents):
        defends = a.defending_hoop[j] == hid
        inb_team = jnp.where(defends, a.team[j], inb_team)
        shooter = scored & (C.AGENT_IDS[j] == b.shot_by_agent)
        delta = jnp.where(defends, -points, points).astype(F32)
        a = a.replace(stat_points=a.stat_points.at[j].add(
            jnp.where(shooter, delta, 0.0)))

    is_team0_hoop = hid == g.team0_hoop
    g = g.replace(
        team1_score=g.team1_score + jnp.where(
            scored & is_team0_hoop, points.astype(F32), 0.0),
        team0_score=g.team0_score + jnp.where(
            scored & (~is_team0_hoop), points.astype(F32), 0.0),
        scored_baskets=g.scored_baskets + jnp.where(scored, 1.0, 0.0),
    )
    inbound_spot = jnp.stack([
        jnp.where(is_team0_hoop, C.COURT_MIN_X, C.COURT_MAX_X).astype(F32),
        h.pos[hi, 1] + C.PIXELS_PER_METER / 60.0,
        jnp.zeros((), F32),
    ])

    b = b.replace(
        in_flight=jnp.where(scored, 0, b.in_flight),
        vel=jnp.where(scored, jnp.zeros(3, F32), b.vel),
        shot_by_agent=jnp.where(scored, PLACEHOLDER, b.shot_by_agent),
        shot_by_team=jnp.where(scored, PLACEHOLDER, b.shot_by_team),
        shot_point_value=jnp.where(scored, 2, b.shot_point_value),
        shot_going_in=jnp.where(scored, 0, b.shot_going_in),
    )

    # Full game: move the ball to the baseline and assign an inbounder;
    # 1v1: flag a world reset instead (src/game.cpp:940-950).
    full = scored & (g.is_one_on_one == 0)
    b = b.replace(pos=jnp.where(full, inbound_spot, b.pos))
    s = s.replace(agents=a, ball=b, game=g)
    inb_orient = find_rotation_between_vectors(
        FWD, find_vector_to_center(cfg, inbound_spot))
    s = assign_inbounder(cfg, s, full, inb_team, inbound_spot, inb_orient,
                         is_oob=False)
    one = scored & (g.is_one_on_one != 0)
    return s.replace(reset_now=jnp.where(one, 1, s.reset_now))


# =====================================================================
# 10. outOfBoundsSystem (src/game.cpp:1055-1113)
# =====================================================================

def out_of_bounds_system(cfg: SimConfig, s: State) -> State:
    a, b, g = s.agents, s.ball, s.game

    oob = ((b.pos[0] < C.COURT_MIN_X) | (b.pos[0] > C.COURT_MAX_X) |
           (b.pos[1] < C.COURT_MIN_Y) | (b.pos[1] > C.COURT_MAX_Y))
    trigger = oob & (g.inbounding_in_progress == 0)

    # 1v1 / TAG: -100 to the offense, reset (src/game.cpp:1069-1082).
    one = trigger & (g.is_one_on_one == 1)
    off_idx_is_1 = a.team[1].astype(F32) == g.team_in_possession
    pen = jnp.where(one, -100.0, 0.0)
    a = a.replace(reward=a.reward
                  .at[0].add(jnp.where(off_idx_is_1, 0.0, pen))
                  .at[1].add(jnp.where(off_idx_is_1, pen, 0.0)))
    reset_now = jnp.where(one, 1, s.reset_now)

    # Full game: dead ball, possession flips, inbound (src/game.cpp:1084-1111).
    full = trigger & (g.is_one_on_one != 1)
    b = b.replace(
        in_flight=jnp.where(full, 0, b.in_flight),
        vel=jnp.where(full, jnp.zeros(3, F32), b.vel),
    )
    g = g.replace(live_ball=jnp.where(full, 0, g.live_ball))
    new_team = (1 - b.last_touched_team).astype(I32)

    for i in range(cfg.num_agents):
        carrier = full & (a.has_ball[i] == 1) & (a.held_ball_id[i] == C.BALL_ID)
        nudged = a.pos[i] + find_vector_to_center(cfg, a.pos[i])
        a = a.replace(
            pos=a.pos.at[i].set(jnp.where(carrier, nudged, a.pos[i])),
            has_ball=a.has_ball.at[i].set(jnp.where(carrier, 0, a.has_ball[i])),
            held_ball_id=a.held_ball_id.at[i].set(
                jnp.where(carrier, PLACEHOLDER, a.held_ball_id[i])),
        )

    s = s.replace(agents=a, ball=b, game=g, reset_now=reset_now)
    inb_orient = find_rotation_between_vectors(
        FWD, find_vector_to_center(cfg, b.pos))
    return assign_inbounder(cfg, s, full, new_team, b.pos, inb_orient,
                            is_oob=True)


# =====================================================================
# 11. updateLastTouchSystem (src/game.cpp:1034-1051)
# =====================================================================

def update_last_touch_system(cfg: SimConfig, s: State) -> State:
    a, b = s.agents, s.ball
    for i in range(cfg.num_agents):
        touch = length(b.pos - a.pos[i]) <= C.AGENT_SIZE_M
        b = b.replace(
            last_touched_agent=jnp.where(touch, C.AGENT_IDS[i],
                                         b.last_touched_agent),
            last_touched_team=jnp.where(touch, a.team[i],
                                        b.last_touched_team),
        )
    return s.replace(ball=b)


# =====================================================================
# 12. clockSystem (src/game.cpp:992-1030)
# =====================================================================

def clock_system(cfg: SimConfig, s: State) -> State:
    a, g = s.agents, s.game
    dt = cfg.sim_dt

    run = (g.live_ball > 0) & (g.game_clock > 0.0)
    game_clock = jnp.where(run, g.game_clock - dt, g.game_clock)
    shot_clock = jnp.where(run, g.shot_clock - dt, g.shot_clock)

    inb = g.inbounding_in_progress > 0
    inbound_clock = jnp.where(inb, g.inbound_clock - dt, g.inbound_clock)

    # Game-clock expiry: +10 to the in-possession agent, reset
    # (src/game.cpp:1009-1021; the off-agent scan defaults to agents[0]).
    expire = (game_clock <= 0.0) & (g.live_ball > 0)
    off_idx_is_1 = a.team[1].astype(F32) == g.team_in_possession
    bonus = jnp.where(expire, 10.0, 0.0)
    a = a.replace(reward=a.reward
                  .at[0].add(jnp.where(off_idx_is_1, 0.0, bonus))
                  .at[1].add(jnp.where(off_idx_is_1, bonus, 0.0)))
    reset_now = jnp.where(expire, 1, s.reset_now)

    shot_clock = jnp.where(shot_clock < 0.0, 0.0, shot_clock)
    g = g.replace(game_clock=game_clock, shot_clock=shot_clock,
                  inbound_clock=inbound_clock)
    return s.replace(agents=a, game=g, reset_now=reset_now)


# =====================================================================
# 13. inboundViolationSystem (src/game.cpp:1116-1157)
# =====================================================================

def inbound_violation_system(cfg: SimConfig, s: State) -> State:
    a, b, g = s.agents, s.ball, s.game

    trig = (g.inbounding_in_progress > 0) & (g.inbound_clock <= 0.0)
    new_team = (1 - g.team_in_possession.astype(I32)).astype(I32)
    g = g.replace(live_ball=jnp.where(trig, 0, g.live_ball))

    ball_to_turnover = jnp.array(PLACEHOLDER, I32)
    for i in range(cfg.num_agents):
        was_inb = trig & (a.im_inbounding[i] > 0)
        ball_to_turnover = jnp.where(was_inb, a.held_ball_id[i],
                                     ball_to_turnover)
        nudged = a.pos[i] + find_vector_to_center(cfg, a.pos[i])
        a = a.replace(
            im_inbounding=a.im_inbounding.at[i].set(
                jnp.where(was_inb, 0, a.im_inbounding[i])),
            has_ball=a.has_ball.at[i].set(jnp.where(was_inb, 0, a.has_ball[i])),
            held_ball_id=a.held_ball_id.at[i].set(
                jnp.where(was_inb, PLACEHOLDER, a.held_ball_id[i])),
            pos=a.pos.at[i].set(jnp.where(was_inb, nudged, a.pos[i])),
        )

    do_turnover = trig & (ball_to_turnover == C.BALL_ID)
    b = b.replace(
        grabbed=jnp.where(do_turnover, 0, b.grabbed),
        holder=jnp.where(do_turnover, PLACEHOLDER, b.holder),
    )
    s = s.replace(agents=a, ball=b, game=g)
    inb_orient = find_rotation_between_vectors(
        FWD, find_vector_to_center(cfg, b.pos))
    return assign_inbounder(cfg, s, do_turnover, new_team, b.pos, inb_orient,
                            is_oob=True)


# =====================================================================
# 15. updatePointsWorthSystem (src/game.cpp:129-161)
# =====================================================================

def update_points_worth_system(cfg: SimConfig, s: State) -> State:
    a, h = s.agents, s.hoops
    new_pw = []
    for i in range(cfg.num_agents):
        target = jnp.where(C.HOOP_IDS[0] != a.defending_hoop[i],
                           h.zone_center[0], h.zone_center[1])
        new_pw.append(get_shot_point_value(a.pos[i], target))
    return s.replace(agents=a.replace(points_worth=jnp.stack(new_pw)))


# =====================================================================
# 16. agentCollisionSystem (src/game.cpp:537-648)
# =====================================================================

def _rect_vertices(center, orient):
    fwd = quat_rotate(orient, FWD)
    right = jnp.stack([fwd[1], -fwd[0], jnp.zeros((), F32)])
    half_w = right * (C.AGENT_SHOULDER_WIDTH / 2.0)
    half_d = fwd * (C.AGENT_DEPTH / 2.0)
    verts = jnp.stack([
        center - half_d + half_w,
        center - half_d - half_w,
        center + half_d - half_w,
        center + half_d + half_w,
    ])
    return verts, fwd, right


def agent_collision_system(cfg: SimConfig, s: State) -> State:
    # Entity-id-ordered pair iteration (src/game.cpp:549) -> for N=2 exactly
    # one check with A = agent 0, B = agent 1.
    a, g = s.agents, s.game

    verts_a, fwd_a, right_a = _rect_vertices(a.pos[0], a.orient[0])
    verts_b, fwd_b, right_b = _rect_vertices(a.pos[1], a.orient[1])

    axes = [normalize_unsafe(right_a), normalize_unsafe(fwd_a),
            normalize_unsafe(right_b), normalize_unsafe(fwd_b)]

    colliding = jnp.ones((), jnp.bool_)
    min_overlap = jnp.array(3.4028235e38, F32)  # FLT_MAX
    mtv = jnp.zeros(3, F32)
    for axis in axes:
        pa = verts_a @ axis
        pb = verts_b @ axis
        pa_min, pa_max = jnp.min(pa), jnp.max(pa)
        pb_min, pb_max = jnp.min(pb), jnp.max(pb)
        colliding = colliding & (pa_max > pb_min) & (pb_max > pa_min)
        overlap = jnp.minimum(pa_max, pb_max) - jnp.maximum(pa_min, pb_min)
        smaller = overlap < min_overlap  # strict: first minimum wins
        min_overlap = jnp.where(smaller, overlap, min_overlap)
        mtv = jnp.where(smaller, axis, mtv)

    reset_now = s.reset_now
    if cfg.tag_mode:
        # ======================== FOR TAG (src/game.cpp:622-631) =========
        hit = colliding & (g.team_in_possession == a.team[0].astype(F32))
        a = a.replace(reward=a.reward
                      .at[0].add(jnp.where(hit, -10.0, 0.0))
                      .at[1].add(jnp.where(hit, 10.0, 0.0)))
        reset_now = jnp.where(hit, 1, reset_now)

    c2c = a.pos[1] - a.pos[0]
    mtv = jnp.where(jnp.sum(c2c * mtv) < 0.0, -mtv, mtv)
    correction = mtv * min_overlap * 0.5
    a = a.replace(pos=a.pos
                  .at[0].set(jnp.where(colliding, a.pos[0] - correction,
                                       a.pos[0]))
                  .at[1].set(jnp.where(colliding, a.pos[1] + correction,
                                       a.pos[1])))
    return s.replace(agents=a, reset_now=reset_now)


# =====================================================================
# 17. hardCodeDefenseSystem (src/game.cpp:651-755)
# =====================================================================

_MOVE_DIRECTIONS = np.array([
    [0.0, -1.0, 0.0],   # 0: Up
    [1.0, -1.0, 0.0],   # 1: Up-Right
    [1.0, 0.0, 0.0],    # 2: Right
    [1.0, 1.0, 0.0],    # 3: Down-Right
    [0.0, 1.0, 0.0],    # 4: Down
    [-1.0, 1.0, 0.0],   # 5: Down-Left
    [-1.0, 0.0, 0.0],   # 6: Left
    [-1.0, -1.0, 0.0],  # 7: Up-Left
], np.float32)


def hard_code_defense_system(cfg: SimConfig, s: State) -> State:
    a, g, h = s.agents, s.game, s.hoops
    dt = cfg.sim_dt

    for i in range(cfg.num_agents):
        on_offense = g.team_in_possession == a.team[i].astype(F32)

        # First ball holder in index order (src/game.cpp:669-688).
        found = jnp.zeros((), jnp.bool_)
        off_pos = jnp.zeros(3, F32)
        for j in range(cfg.num_agents):
            hit = (a.has_ball[j] == 1) & (~found)
            off_pos = jnp.where(hit, a.pos[j], off_pos)
            found = found | hit

        my_hoop = jnp.where(a.defending_hoop[i] == C.HOOP_IDS[0],
                            h.pos[0], h.pos[1])
        hoop_dir = my_hoop - off_pos
        guard = jnp.where(length2(hoop_dir) > 1e-6,
                          off_pos + C.GUARDING_DISTANCE *
                          (hoop_dir * jax.lax.rsqrt(
                              jnp.maximum(length2(hoop_dir), 1e-30))),
                          off_pos)

        chase = (~on_offense) & found
        interp = a.reaction_speed[i] * dt
        target = jnp.where(chase,
                           a.target_pos[i] + (guard - a.target_pos[i]) * interp,
                           a.target_pos[i])

        mv = target - a.pos[i]
        small = length2(mv) < 0.01
        act_move = chase & (~small)

        desired = mv * jax.lax.rsqrt(jnp.maximum(length2(mv), 1e-30))
        dots = _MOVE_DIRECTIONS / jnp.linalg.norm(
            _MOVE_DIRECTIONS, axis=1, keepdims=True) @ desired
        best = jnp.argmax(dots).astype(I32)  # first max wins, like strict >

        ovec = quat_rotate(a.orient[i], FWD)
        ang = jnp.arccos(jnp.clip(jnp.sum(ovec * desired), -1.0, 1.0))
        cross = ovec[0] * mv[1] - ovec[1] * mv[0]
        rot = jnp.where(cross < 0.0, -1,
                        jnp.where(cross > 0.0, 1, 0)).astype(I32)
        rot = jnp.where(ang > jnp.pi / 8.0, rot, 0)

        move = jnp.where(on_offense, 0,
                         jnp.where(~found, 0,
                                   jnp.where(small, 0, 1))).astype(I32)
        action = a.action[i]
        action = action.at[0].set(move)
        action = action.at[1].set(jnp.where(act_move, best, action[1]))
        action = action.at[2].set(jnp.where(act_move, rot, action[2]))
        action = action.at[3].set(jnp.where(on_offense, action[3], 1))
        a = a.replace(
            action=a.action.at[i].set(action),
            target_pos=a.target_pos.at[i].set(target),
        )
    return s.replace(agents=a)


# =====================================================================
# 18. fillObservationsSystem (src/game.cpp:1175-1461)
# =====================================================================

def _safe_dir(vec):
    """normalize if length2 > 1e-6 else zero vector (reference guard)."""
    inv = jax.lax.rsqrt(jnp.maximum(length2(vec), 1e-30))
    return jnp.where(length2(vec) > 1e-6, vec * inv, jnp.zeros(3, F32))


def _agent_obs_block(pos, orient, vel, im_inb, cooldown, max_speed, quickness,
                     shooting, ft_pct, reaction, shot_pct, points_worth,
                     has_ball, hoop_pos, ball_pos, self_block, rel_pos=None):
    """The 38-float per-agent feature block (src/game.cpp:1290-1322 self,
    1380-1421 opponent).  `self_block` swaps the vec-to-agent slot for the
    zeros the reference writes for the observing agent."""
    parts = [pos]
    if self_block:
        parts.append(jnp.zeros(3, F32))
        parts.append(jnp.zeros(1, F32))
    else:
        parts.append(_safe_dir(rel_pos))
        parts.append(length(rel_pos)[None])
    ovec = quat_rotate(orient, FWD)
    veln = jnp.where(length2(vel) > 1e-6,
                     vel * jax.lax.rsqrt(jnp.maximum(length2(vel), 1e-30)),
                     jnp.zeros(3, F32))
    dot = jnp.where(length2(vel) > 1e-6, jnp.sum(veln * ovec), 0.0)
    accel = jnp.where(dot <= 0.8, 0.1, 1.0)
    dir_hoop = hoop_pos - pos
    dist_hoop = length(dir_hoop)
    dir_hoop_n = jnp.where(dist_hoop > 1e-6,
                           dir_hoop * jax.lax.rsqrt(
                               jnp.maximum(length2(dir_hoop), 1e-30)),
                           jnp.zeros(3, F32))
    dir_ball = ball_pos - pos
    dist_ball = length(dir_ball)
    dir_ball_n = jnp.where(dist_ball > 1e-6,
                           dir_ball * jax.lax.rsqrt(
                               jnp.maximum(length2(dir_ball), 1e-30)),
                           jnp.zeros(3, F32))
    parts += [
        orient, ovec, veln,
        jnp.stack([length(vel), dot, accel]),
        dir_hoop_n, dist_hoop[None],
        dir_ball_n, dist_ball[None],
        jnp.stack([im_inb.astype(F32), cooldown, max_speed, quickness,
                   shooting, ft_pct, reaction, shot_pct,
                   points_worth.astype(F32), has_ball.astype(F32)]),
    ]
    return jnp.concatenate(parts)  # 38 floats


def fill_observations_system(cfg: SimConfig, s: State) -> State:
    a, b, g, h = s.agents, s.ball, s.game, s.hoops

    # Inbounder id: last agent with imInbounding set, -1 if none
    # (src/game.cpp:1235-1249).
    inbounder_id = jnp.array(-1, I32)
    for j in range(cfg.num_agents):
        inbounder_id = jnp.where(a.im_inbounding[j] > 0, C.AGENT_IDS[j],
                                 inbounder_id)

    all_obs = []
    for i in range(cfg.num_agents):
        att_hoop = jnp.where(C.HOOP_IDS[0] != a.defending_hoop[i],
                             h.pos[0], h.pos[1])
        def_hoop = jnp.where(C.HOOP_IDS[0] == a.defending_hoop[i],
                             h.pos[0], h.pos[1])

        own_first = a.team[i] == 0
        scores = jnp.where(own_first,
                           jnp.stack([g.team0_score, g.team1_score]),
                           jnp.stack([g.team1_score, g.team0_score]))

        parts = [
            jnp.stack([g.game_clock, g.shot_clock, g.period,
                       g.inbounding_in_progress.astype(F32),
                       g.inbound_clock]),
            scores,
            b.pos, b.vel,
            jnp.stack([b.grabbed.astype(F32), b.in_flight.astype(F32),
                       b.shot_point_value.astype(F32),
                       b.last_touched_team.astype(F32)]),
            att_hoop, def_hoop,
            _agent_obs_block(
                a.pos[i], a.orient[i], a.vel[i], a.im_inbounding[i],
                a.grab_cooldown[i], a.max_speed[i], a.quickness[i],
                a.shooting[i], a.ft_pct[i], a.reaction_speed[i],
                a.shot_pct[i], a.points_worth[i], a.has_ball[i],
                att_hoop, b.pos, self_block=True),
        ]

        # Teammate blocks: (N/2 - 1) = 0 for N=2.  Opponent blocks: N/2 = 1.
        # Opponents' dir-to-hoop uses *my defending* hoop — their attacking
        # one (src/game.cpp:1395).
        for j in range(cfg.num_agents):
            if j == i:
                continue
            parts.append(_agent_obs_block(
                a.pos[j], a.orient[j], a.vel[j], a.im_inbounding[j],
                a.grab_cooldown[j], a.max_speed[j], a.quickness[j],
                a.shooting[j], a.ft_pct[j], a.reaction_speed[j],
                a.shot_pct[j], a.points_worth[j], a.has_ball[j],
                def_hoop, b.pos, self_block=False,
                rel_pos=a.pos[j] - a.pos[i]))

        holder_onehot = jnp.stack([
            (jnp.array(C.AGENT_IDS[j], I32) == b.holder).astype(F32)
            for j in range(cfg.num_agents)])
        inbounder_onehot = jnp.stack([
            (jnp.array(C.AGENT_IDS[j], I32) == inbounder_id).astype(F32)
            for j in range(cfg.num_agents)])
        parts += [holder_onehot, inbounder_onehot]

        obs = jnp.concatenate(parts)
        pad = C.OBS_SIZE - obs.shape[0]
        assert pad >= 0, f"observation overflow: {obs.shape[0]} > {C.OBS_SIZE}"
        obs = jnp.concatenate([obs, jnp.zeros(pad, F32)])
        all_obs.append(obs)

    return s.replace(agents=a.replace(obs=jnp.stack(all_obs)))


# =====================================================================
# 19. rewardSystem (src/game.cpp:811-870)
# =====================================================================

def reward_system(cfg: SimConfig, s: State) -> State:
    a, b, g = s.agents, s.ball, s.game
    new_rewards = []
    for i in range(cfg.num_agents):
        other = 1 - i  # the only other agent (src/game.cpp:820-824)
        dist_other = length(a.pos[other] - a.pos[i])
        on_offense = a.team[i].astype(F32) == g.team_in_possession

        r = a.reward[i]

        off_active = on_offense & (g.game_clock > 5.0)
        mine = b.shot_by_agent == C.AGENT_IDS[i]
        made = mine & (b.shot_going_in == 1)
        missing = mine & (b.shot_going_in == 0) & (b.in_flight == 1)
        r = r + jnp.where(off_active & made, b.shot_point_value.astype(F32),
                          0.0)
        r = r - jnp.where(off_active & (~made) & missing, 1.0, 0.0)
        r = r + jnp.where(off_active, a.shot_pct[i], 0.0)

        r = r + jnp.where(~on_offense,
                          -1.0 + jnp.exp(-0.4 * dist_other), 0.0)
        new_rewards.append(r)
    return s.replace(agents=a.replace(reward=jnp.stack(new_rewards)))
