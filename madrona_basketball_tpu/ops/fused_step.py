"""The fused simulation step over the flat SoA field-row layout.

`step_fields` re-expresses the entire 19-system chain (systems.py, itself a
re-expression of reference src/game.cpp) as straight-line code over
lane-contiguous (L,) field vectors — no reshapes, no transposes, no
sub-(8,128) tiles.  It runs two ways:

  * `fused_step_xla`   — plain jitted XLA over full (W,) rows; used to
    validate the transcription against the structured engine on CPU.
  * `make_fused_step`  — ONE Pallas TPU kernel over world blocks: every
    field row lives in VMEM for the duration of the step, collapsing the
    ~350 fusions of the structured path into a single kernel launch.

Trig note: Mosaic doesn't lower atan2/acos/erf/atan.  The shot direction is
computed with angle-addition identities instead of atan2+sin/cos
(sin(i+d) = sin_i cos_d + cos_i sin_d with sin_i = ideal_x/dist,
cos_i = ideal_y/dist — algebraically identical to src/game.cpp:302,345);
the defender's turn test acos(dot) > pi/8 becomes dot < cos(pi/8); the
rotation-aligning-forward-to-a-unit-in-plane-vector is built via half-angle
square roots; atan/erf (shot percentage, src/game.cpp:806-808) use minimax
polynomials (ops/tmath.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..config import SimConfig
from . import tmath
from .layout import (AGENT_F32, AGENT_I32, BALL_F32, BALL_I32, F_IDX,
                     GAME_F32, GAME_I32, HOOP_F32, HOOP_I32, I_IDX,
                     N_F32_ROWS, N_I32_ROWS, N_NOISE_ROWS, N_OBS_ROWS)

F32 = jnp.float32
I32 = jnp.int32
A = C.NUM_AGENTS
PLACEHOLDER = C.ENTITY_ID_PLACEHOLDER
DT = C.TIMESTEPS_TO_SECONDS_FACTOR
COS_PI_8 = math.cos(math.pi / 8.0)
TURN_W = math.cos(math.pi / 180.0 * 3.0)   # cos(6deg / 2)
TURN_Z = math.sin(math.pi / 180.0 * 3.0)   # sin(6deg / 2)

# The 8 move directions of hardCodeDefense (src/game.cpp:713-722), normalized.
_S2 = 1.0 / math.sqrt(2.0)
MOVE_DIRS = ((0.0, -1.0), (_S2, -_S2), (1.0, 0.0), (_S2, _S2),
             (0.0, 1.0), (-_S2, _S2), (-1.0, 0.0), (-_S2, -_S2))


def _hoop_geometry(cfg: SimConfig):
    court_start_x = (cfg.grid_width - C.COURT_LENGTH_M) / 2.0
    cy = cfg.grid_height / 2.0
    return ((court_start_x + C.HOOP_FROM_BASELINE_M, cy),
            (court_start_x + C.COURT_LENGTH_M - C.HOOP_FROM_BASELINE_M, cy))


def _rsqrt_safe(x):
    return jax.lax.rsqrt(jnp.maximum(x, 1e-30))


def _fwd_from_quat(qw, qx, qy, qz):
    """rotate (0,1,0) by q — the only rotation the game ever applies."""
    fx = 2.0 * (qx * qy - qw * qz)
    fy = 1.0 - 2.0 * (qx * qx + qz * qz)
    fz = 2.0 * (qy * qz + qw * qx)
    return fx, fy, fz


def _rot_fwd_to(tx, ty):
    """Quat aligning (0,1,0) with the unit in-plane vector (tx, ty, 0)
    (src/helper.cpp:14-42 specialised; half-angle form, no acos)."""
    d = jnp.clip(ty, -1.0, 1.0)
    w = jnp.sqrt(jnp.maximum((1.0 + d) * 0.5, 0.0))
    z = -jnp.sign(tx) * jnp.sqrt(jnp.maximum((1.0 - d) * 0.5, 0.0))
    # aligned -> identity; opposite -> 180deg about +z, matching the C++.
    w = jnp.where(d > 0.999999, 1.0, jnp.where(d < -0.999999, 0.0, w))
    z = jnp.where(d > 0.999999, 0.0, jnp.where(d < -0.999999, 1.0, z))
    zero = jnp.zeros_like(w)
    return w, zero, zero, z


def _shot_point_value(cfg, px, py, hoop_xy, left_hoop: bool):
    """2 vs 3 points (src/helper.cpp:50-81); hoop position is static."""
    hx, hy = hoop_xy
    dx = px - hx
    dy = py - hy
    dist = jnp.sqrt(dx * dx + dy * dy)
    in_corner = ((py < C.COURT_MIN_Y + C.CORNER_3_FROM_SIDELINE_M) |
                 (py > C.COURT_MIN_Y + C.COURT_WIDTH_M -
                  C.CORNER_3_FROM_SIDELINE_M))
    if left_hoop:
        corner3 = in_corner & (px <= C.COURT_MIN_X +
                               C.CORNER_3_LENGTH_FROM_BASELINE_M)
    else:
        corner3 = in_corner & (px >= C.COURT_MIN_X + C.COURT_LENGTH_M -
                               C.CORNER_3_LENGTH_FROM_BASELINE_M)
    return jnp.where(corner3 | (dist >= C.ARC_RADIUS_M), 3, 2).astype(I32)


def _to_center(cfg, px, py):
    """Unit vector toward the grid start point (src/helper.cpp:44-48)."""
    dx = cfg.start_x - px
    dy = cfg.start_y - py
    inv = _rsqrt_safe(dx * dx + dy * dy)
    return dx * inv, dy * inv


def _assign_inbounder(cfg, ag, ball, game, active, new_team, spot_x, spot_y,
                      spot_z, qw, qz, is_oob: bool):
    """src/game.cpp:14-53 over field vectors."""
    assigned = jnp.zeros_like(active)
    for i in range(A):
        take = active & (ag[i]["team"] == new_team) & (~assigned)
        ag[i]["im_inb"] = jnp.where(take, 1, ag[i]["im_inb"])
        ag[i]["pos_x"] = jnp.where(take, spot_x, ag[i]["pos_x"])
        ag[i]["pos_y"] = jnp.where(take, spot_y, ag[i]["pos_y"])
        ag[i]["pos_z"] = jnp.where(take, spot_z, ag[i]["pos_z"])
        ag[i]["has_ball"] = jnp.where(take, 1, ag[i]["has_ball"])
        ag[i]["held_ball"] = jnp.where(take, C.BALL_ID, ag[i]["held_ball"])
        ag[i]["quat_w"] = jnp.where(take, qw, ag[i]["quat_w"])
        ag[i]["quat_x"] = jnp.where(take, 0.0, ag[i]["quat_x"])
        ag[i]["quat_y"] = jnp.where(take, 0.0, ag[i]["quat_y"])
        ag[i]["quat_z"] = jnp.where(take, qz, ag[i]["quat_z"])
        ball["bgrabbed"] = jnp.where(take, 1, ball["bgrabbed"])
        ball["bholder"] = jnp.where(take, C.AGENT_IDS[i], ball["bholder"])
        assigned = assigned | take
    found = active & assigned
    game["tip"] = jnp.where(found, new_team.astype(F32), game["tip"])
    game["ginb"] = jnp.where(found, 1, game["ginb"])
    game["iclock"] = jnp.where(found, 5.0, game["iclock"])
    if is_oob:
        game["oob"] = game["oob"] + jnp.where(found, 1.0, 0.0)


def _setup_agent_positions(cfg, ag, game, noise):
    """src/helper.cpp:108-160 over field vectors; returns ball spawn."""
    one = game["is1v1"] == 1
    x_dev = noise["reset_x"] * C.START_POS_STDDEV
    y_dev = noise["reset_y"] * C.START_POS_STDDEV
    p0x = jnp.clip(cfg.start_x + x_dev, 0.0, cfg.grid_width)
    p0y = jnp.clip(cfg.start_y + y_dev, 0.0, cfg.grid_height)
    angle = noise["reset_angle"] * (2.0 * jnp.pi)
    p1x = jnp.clip(p0x + C.DEFENDER_SPAWN_RADIUS * jnp.cos(angle),
                   0.0, cfg.grid_width)
    p1y = jnp.clip(p0y + C.DEFENDER_SPAWN_RADIUS * jnp.sin(angle),
                   0.0, cfg.grid_height)

    for i in range(A):
        gx = cfg.start_x - 1.0 + 2.0 * (i % 2)
        gy = cfg.start_y - 2.0 + i // 2
        ag[i]["pos_x"] = jnp.where(one, p0x if i == 0 else p1x, gx)
        ag[i]["pos_y"] = jnp.where(one, p0y if i == 0 else p1y, gy)
        ag[i]["pos_z"] = jnp.zeros_like(p0x)
        ag[i]["has_ball"] = jnp.full_like(ag[i]["has_ball"],
                                          1 if i == 0 else 0)
        ag[i]["held_ball"] = jnp.full_like(
            ag[i]["held_ball"], C.BALL_ID if i == 0 else PLACEHOLDER)
        ag[i]["points_worth"] = jnp.full_like(ag[i]["points_worth"], 2)
        ag[i]["max_speed"] = jnp.full_like(
            ag[i]["max_speed"], C.DEFAULT_SPEED - i * C.DEFENDER_SLOWDOWN)
        ag[i]["quickness"] = jnp.ones_like(ag[i]["quickness"])
        ag[i]["shooting"] = jnp.zeros_like(ag[i]["shooting"])
        ag[i]["ft_pct"] = jnp.zeros_like(ag[i]["ft_pct"])
        ag[i]["reaction"] = jnp.full_like(ag[i]["reaction"],
                                          i * C.DEFENDER_REACTION)
        ag[i]["target_x"] = ag[i]["pos_x"]
        ag[i]["target_y"] = ag[i]["pos_y"]
        ag[i]["target_z"] = ag[i]["pos_z"]
        ag[i]["shot_pct"] = jnp.zeros_like(ag[i]["shot_pct"])
    spawn_x = jnp.where(one, ag[0]["pos_x"],
                        jnp.full_like(p0x, cfg.start_x))
    spawn_y = jnp.where(one, ag[0]["pos_y"],
                        jnp.full_like(p0y, cfg.start_y))
    return spawn_x, spawn_y


def _reset_world_fields(cfg, ag, ball, game, hoops, noise):
    """src/gen.cpp:216-316 over field vectors; returns the candidate
    post-reset dicts (the caller selects per world on reset_now)."""
    import copy
    ag = [dict(a) for a in ag]
    ball = dict(ball)
    game = dict(game)
    hoops = dict(hoops)
    del copy

    rollover = (game["gclock"] <= 0.0) & (game["is1v1"] == 0)
    cont = (game["period"] < 4.0) | (game["t0score"] == game["t1score"])
    rc = rollover & cont

    def pick(roll_val, fresh_val):
        return jnp.where(rollover, roll_val, fresh_val)

    game["period"] = pick(jnp.where(rc, game["period"] + 1.0,
                                    game["period"]), 1.0)
    game["gclock"] = pick(jnp.where(rc, cfg.time_per_period, game["gclock"]),
                          cfg.time_per_period)
    game["sclock"] = pick(jnp.where(rc, cfg.shot_clock_duration,
                                    game["sclock"]),
                          cfg.shot_clock_duration)
    game["glive"] = pick(jnp.where(rc, 1, 0), 1).astype(I32)
    game["ginb"] = pick(jnp.where(rc, 0, game["ginb"]), 0).astype(I32)
    game["tip"] = pick(game["tip"], 0.0)
    game["t0score"] = pick(game["t0score"], 0.0)
    game["t1score"] = pick(game["t1score"], 0.0)
    game["sbaskets"] = pick(game["sbaskets"], 0.0)
    game["oob"] = pick(game["oob"], 0.0)
    game["iclock"] = pick(game["iclock"], 0.0)

    for i in range(A):
        a = ag[i]
        for n in ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
                  "a_shoot", "m_move", "m_grab", "m_pass", "m_shoot",
                  "reset", "cur_step", "im_inb"):
            a[n] = jnp.zeros_like(a[n])
        a["allowed_move"] = jnp.ones_like(a["allowed_move"])
        a["done"] = jnp.ones_like(a["done"])
        sign = -1.0 if i % 2 == 0 else 1.0
        a["quat_w"] = jnp.full_like(a["quat_w"], math.cos(math.pi / 4))
        a["quat_x"] = jnp.zeros_like(a["quat_x"])
        a["quat_y"] = jnp.zeros_like(a["quat_y"])
        a["quat_z"] = jnp.full_like(a["quat_z"],
                                    sign * math.sin(math.pi / 4))
        a["cooldown"] = jnp.zeros_like(a["cooldown"])
        a["stat_points"] = jnp.zeros_like(a["stat_points"])
        a["stat_fouls"] = jnp.zeros_like(a["stat_fouls"])
        a["vel_x"] = jnp.zeros_like(a["vel_x"])
        a["vel_y"] = jnp.zeros_like(a["vel_y"])
        a["vel_z"] = jnp.zeros_like(a["vel_z"])
        a["team"] = jnp.full_like(a["team"], i % 2)
        col = C.RESET_TEAM_COLORS[i % 2]
        a["color_r"] = jnp.full_like(a["color_r"], col[0])
        a["color_g"] = jnp.full_like(a["color_g"], col[1])
        a["color_b"] = jnp.full_like(a["color_b"], col[2])
        a["defend_hoop"] = jnp.where(i % 2 == 0, game["t0hoop"],
                                     game["t1hoop"])

    spawn_x, spawn_y = _setup_agent_positions(cfg, ag, game, noise)

    ball["bpos_x"] = spawn_x
    ball["bpos_y"] = spawn_y
    ball["bpos_z"] = jnp.zeros_like(spawn_x)
    ball["breset"] = jnp.zeros_like(ball["breset"])
    ball["bdone"] = jnp.ones_like(ball["bdone"])
    ball["bcur_step"] = jnp.zeros_like(ball["bcur_step"])
    ball["binflight"] = jnp.zeros_like(ball["binflight"])
    for n in ("blt_agent", "blt_team", "bsb_agent", "bsb_team"):
        ball[n] = jnp.full_like(ball[n], PLACEHOLDER)
    ball["bspv"] = jnp.full_like(ball["bspv"], 2)
    ball["bsgi"] = jnp.zeros_like(ball["bsgi"])
    for n in ("bvel_x", "bvel_y", "bvel_z"):
        ball[n] = jnp.zeros_like(ball[n])
    one = game["is1v1"] == 1
    ball["bgrabbed"] = jnp.where(one, 1, 0).astype(I32)
    ball["bholder"] = jnp.where(one, C.AGENT_IDS[0], PLACEHOLDER).astype(I32)

    hoops["hdone0"] = jnp.ones_like(hoops["hdone0"])
    hoops["hdone1"] = jnp.ones_like(hoops["hdone1"])
    hoops["hcur0"] = jnp.zeros_like(hoops["hcur0"])
    hoops["hcur1"] = jnp.zeros_like(hoops["hcur1"])
    hoops["hreset0"] = jnp.zeros_like(hoops["hreset0"])
    hoops["hreset1"] = jnp.zeros_like(hoops["hreset1"])
    return ag, ball, game, hoops


def step_fields(cfg: SimConfig, ag, ball, game, hoops, noise,
                compute_obs: bool = True):
    """One full tick over field dicts; mutates and returns
    (ag, ball, game, hoops, obs_rows).

    compute_obs=False skips system 18 (fillObservations) entirely — no
    other system reads the obs buffer (reward reads shot_pct, not obs;
    src/game.cpp:1518-1523 ordering), so intermediate steps of a
    multi-step kernel can drop ~1/3 of the step's arithmetic."""
    w = jnp.where
    (h0x, h0y), (h1x, h1y) = _hoop_geometry(cfg)
    ZONE_R = C.HOOP_SCORE_ZONE_SIZE

    def att_hoop_xy(i):
        """Attacking-hoop coordinates for agent i (dynamic defend_hoop)."""
        is0 = ag[i]["defend_hoop"] == C.HOOP_IDS[0]
        return w(is0, h1x, h0x), w(is0, h1y, h0y)

    def def_hoop_xy(i):
        is0 = ag[i]["defend_hoop"] == C.HOOP_IDS[0]
        return w(is0, h0x, h1x), w(is0, h0y, h1y)

    # ---------------- 1. tick (src/game.cpp:969-988) ----------------
    for a in ag:
        was = a["reset"] == 1
        a["reward"] = jnp.zeros_like(a["reward"])
        a["done"] = w(was, 1.0, 0.0).astype(F32)
        a["cur_step"] = w(was, 0, a["cur_step"] + 1)
        a["cooldown"] = jnp.maximum(0.0, a["cooldown"] - 1.0)

    # ---------------- 2. actionMask (src/game.cpp:489-533) ----------------
    for a in ag:
        can_move = jnp.ones_like(a["m_move"])
        can_grab = jnp.ones_like(a["m_grab"])
        can_pass = w(a["has_ball"] == 1, 1, 0)
        can_shoot = w(a["has_ball"] == 1, 1, 0)
        inb = game["ginb"] == 1
        can_shoot = w(inb, 0, can_shoot)
        can_grab = w(inb, 0, can_grab)
        pinned = inb & (a["im_inb"] == 1) & (game["glive"] == 0)
        can_move = w(pinned, 0, can_move)
        can_grab = w(a["cooldown"] > 0.0, 0, can_grab)
        if cfg.tag_mode:
            can_pass = jnp.zeros_like(can_pass)
            can_grab = jnp.zeros_like(can_grab)
        a["m_move"], a["m_grab"] = can_move, can_grab
        a["m_pass"], a["m_shoot"] = can_pass, can_shoot

    # ---------------- 3. moveAgent (src/game.cpp:410-486) ----------------
    for a in ag:
        do_rot = a["a_rotate"] != 0
        tz = w(a["a_rotate"] == 1, TURN_Z, -TURN_Z)
        # (TURN_W, 0, 0, tz) * q, specialised Hamilton product
        qw, qx, qy, qz = a["quat_w"], a["quat_x"], a["quat_y"], a["quat_z"]
        nqw = TURN_W * qw - tz * qz
        nqx = TURN_W * qx - tz * qy
        nqy = TURN_W * qy + tz * qx
        nqz = TURN_W * qz + tz * qw
        a["quat_w"] = w(do_rot, nqw, qw)
        a["quat_x"] = w(do_rot, nqx, qx)
        a["quat_y"] = w(do_rot, nqy, qy)
        a["quat_z"] = w(do_rot, nqz, qz)

        active = a["m_move"] != 0
        move_angle = a["a_angle"].astype(F32) * C.ANGLE_BETWEEN_DIRECTIONS
        scale = a["quickness"] * a["a_move"].astype(F32)
        dvx = jnp.sin(move_angle) * scale
        dvy = -jnp.cos(move_angle) * scale

        fx, fy, fz = _fwd_from_quat(a["quat_w"], a["quat_x"], a["quat_y"],
                                    a["quat_z"])
        vx, vy, vz = a["vel_x"], a["vel_y"], a["vel_z"]
        vlen2 = vx * vx + vy * vy + vz * vz
        inv = _rsqrt_safe(vlen2)
        dot = w(vlen2 > 1e-6, (vx * fx + vy * fy + vz * fz) * inv, 0.0)
        backwards = dot < -0.1
        sideways = (~backwards) & (dot <= 0.8)
        max_speed = a["max_speed"] * w(backwards, 0.1,
                                       w(sideways, 0.7, 1.0))
        dscale = w(backwards | sideways, 0.1, 1.0)
        vx = vx + dvx * dscale
        vy = vy + dvy * dscale
        max_speed = max_speed * w(a["has_ball"] == 1,
                                  C.BALL_AGENT_SLOWDOWN, 1.0)
        speed2 = vx * vx + vy * vy + vz * vz
        speed = jnp.sqrt(speed2)
        shrink = w(speed > max_speed,
                   max_speed * _rsqrt_safe(speed2), 1.0)
        vx, vy, vz = vx * shrink, vy * shrink, vz * shrink
        nx = jnp.clip(a["pos_x"] + vx * DT, 0.0, cfg.grid_width)
        ny = jnp.clip(a["pos_y"] + vy * DT, 0.0, cfg.grid_height)
        a["pos_x"] = w(active, nx, a["pos_x"])
        a["pos_y"] = w(active, ny, a["pos_y"])
        a["vel_x"] = w(active, vx * 0.95, a["vel_x"])
        a["vel_y"] = w(active, vy * 0.95, a["vel_y"])
        a["vel_z"] = w(active, vz * 0.95, a["vel_z"])

    # ---------------- 4. grab (src/game.cpp:164-239) ----------------
    for i in range(A):
        a = ag[i]
        aid = C.AGENT_IDS[i]
        act = (a["m_grab"] != 0) & (a["a_grab"] != 0)
        a["cooldown"] = w(act, 10.0, a["cooldown"])
        a["a_grab"] = w(act, 0, a["a_grab"])
        ball_act = act & (ball["binflight"] != 1)
        holding = (a["has_ball"] == 1) & (ball["bgrabbed"] == 1) & \
            (ball["bholder"] == aid)
        drop = ball_act & holding
        a["has_ball"] = w(drop, 0, a["has_ball"])
        a["held_ball"] = w(drop, PLACEHOLDER, a["held_ball"])
        ball["bgrabbed"] = w(drop, 0, ball["bgrabbed"])
        ball["bholder"] = w(drop, PLACEHOLDER, ball["bholder"])

        dx = ball["bpos_x"] - a["pos_x"]
        dy = ball["bpos_y"] - a["pos_y"]
        dz = ball["bpos_z"] - a["pos_z"]
        near = jnp.sqrt(dx * dx + dy * dy + dz * dz) <= 0.3
        reach = ball_act & (~holding) & near
        turnover = reach & (game["is1v1"] == 1) & \
            (a["team"].astype(F32) != game["tip"])
        game["reset_now"] = w(turnover, 1, game["reset_now"])
        take = reach & (~turnover)
        for j in range(A):
            victim = take & (ag[j]["held_ball"] == C.BALL_ID)
            ag[j]["has_ball"] = w(victim, 0, ag[j]["has_ball"])
            ag[j]["held_ball"] = w(victim, PLACEHOLDER, ag[j]["held_ball"])
            ag[j]["cooldown"] = w(victim, C.SIMULATION_HZ,
                                  ag[j]["cooldown"])
        a["has_ball"] = w(take, 1, a["has_ball"])
        a["held_ball"] = w(take, C.BALL_ID, a["held_ball"])
        ball["bholder"] = w(take, aid, ball["bholder"])
        ball["bgrabbed"] = w(take, 1, ball["bgrabbed"])
        ball["binflight"] = w(take, 0, ball["binflight"])
        for n in ("bvel_x", "bvel_y", "bvel_z"):
            ball[n] = w(take, 0.0, ball[n])
        ball["bsb_agent"] = w(take, PLACEHOLDER, ball["bsb_agent"])
        ball["bsb_team"] = w(take, PLACEHOLDER, ball["bsb_team"])
        ball["bspv"] = w(take, 2, ball["bspv"])
        game["tip"] = w(take, a["team"].astype(F32), game["tip"])
        game["glive"] = w(take, 1, game["glive"])

    # ---------------- 5. pass (src/game.cpp:243-270) ----------------
    for i in range(A):
        a = ag[i]
        act = (a["m_pass"] != 0) & (a["a_pass"] != 0)
        hold = act & (ball["bholder"] == C.AGENT_IDS[i])
        a["has_ball"] = w(hold, 0, a["has_ball"])
        a["held_ball"] = w(hold, PLACEHOLDER, a["held_ball"])
        a["im_inb"] = w(hold, 0, a["im_inb"])
        fx, fy, fz = _fwd_from_quat(a["quat_w"], a["quat_x"], a["quat_y"],
                                    a["quat_z"])
        ball["bgrabbed"] = w(hold, 0, ball["bgrabbed"])
        ball["bholder"] = w(hold, PLACEHOLDER, ball["bholder"])
        ball["bvel_x"] = w(hold, fx * 0.1, ball["bvel_x"])
        ball["bvel_y"] = w(hold, fy * 0.1, ball["bvel_y"])
        ball["bvel_z"] = w(hold, fz * 0.1, ball["bvel_z"])
        game["ginb"] = w(hold, 0, game["ginb"])

    # ---------------- 6. shoot (src/game.cpp:273-407) ----------------
    for i in range(A):
        a = ag[i]
        aid = C.AGENT_IDS[i]
        act = (a["m_shoot"] != 0) & (a["a_shoot"] != 0)
        ax, ay = att_hoop_xy(i)
        ix = ax - a["pos_x"]
        iy = ay - a["pos_y"]
        dist2 = ix * ix + iy * iy
        dist = jnp.sqrt(dist2)
        inv = _rsqrt_safe(dist2)
        sin_i = w(dist > 0.0, ix * inv, 0.0)
        cos_i = w(dist > 0.0, iy * inv, 1.0)

        dev = noise["shot"][i][0] * (C.DIST_DEVIATION_PER_METER * dist)
        d_def = jnp.full_like(dist, jnp.inf)
        for j in range(A):
            is_def = ag[j]["team"] != a["team"]
            ddx = a["pos_x"] - ag[j]["pos_x"]
            ddy = a["pos_y"] - ag[j]["pos_y"]
            ddz = a["pos_z"] - ag[j]["pos_z"]
            dd = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
            d_def = w(is_def, jnp.minimum(d_def, dd), d_def)
        dev = dev + w(d_def < 2.0,
                      noise["shot"][i][1] *
                      (C.DEF_DEVIATION_PER_METER / (d_def + 0.1)), 0.0)
        vlen = jnp.sqrt(a["vel_x"] ** 2 + a["vel_y"] ** 2 + a["vel_z"] ** 2)
        dev = dev + w(a["a_move"] > 0,
                      noise["shot"][i][2] * (C.VEL_DEVIATION_FACTOR * vlen),
                      0.0)
        # final = (sin(i+dev), cos(i+dev)) via angle addition — equivalent
        # to atan2 + sin/cos in src/game.cpp:302,345.
        sd, cd = jnp.sin(dev), jnp.cos(dev)
        fvx = sin_i * cd + cos_i * sd
        fvy = cos_i * cd - sin_i * sd

        t_along = ix * fvx + iy * fvy
        closest_sq = dist2 - t_along * t_along
        going_in = (~(t_along < 0.0)) & (closest_sq <= ZONE_R * ZONE_R)

        sqw, _, _, sqz = _rot_fwd_to(fvx, fvy)
        a["quat_w"] = w(act, sqw, a["quat_w"])
        a["quat_x"] = w(act, 0.0, a["quat_x"])
        a["quat_y"] = w(act, 0.0, a["quat_y"])
        a["quat_z"] = w(act, sqz, a["quat_z"])

        hold = act & (ball["bholder"] == aid)
        is0 = ag[i]["defend_hoop"] == C.HOOP_IDS[0]
        hoops_geom = _hoop_geometry(cfg)
        spv = w(is0,
                _shot_point_value(cfg, a["pos_x"], a["pos_y"],
                                  hoops_geom[1], left_hoop=False),
                _shot_point_value(cfg, a["pos_x"], a["pos_y"],
                                  hoops_geom[0], left_hoop=True))
        made = hold & going_in
        game["sbaskets"] = game["sbaskets"] + w(made, 1.0, 0.0)
        a["reward"] = a["reward"] + w(hold & (~going_in), -1.0, 0.0)
        a["has_ball"] = w(hold, 0, a["has_ball"])
        a["held_ball"] = w(hold, PLACEHOLDER, a["held_ball"])
        a["im_inb"] = w(hold, 0, a["im_inb"])
        ball["bsgi"] = w(made, 1, ball["bsgi"])
        ball["bgrabbed"] = w(hold, 0, ball["bgrabbed"])
        ball["bholder"] = w(hold, PLACEHOLDER, ball["bholder"])
        ball["bvel_x"] = w(hold, fvx * 0.1, ball["bvel_x"])
        ball["bvel_y"] = w(hold, fvy * 0.1, ball["bvel_y"])
        ball["bvel_z"] = w(hold, 0.0, ball["bvel_z"])
        ball["binflight"] = w(hold, 1, ball["binflight"])
        ball["bsb_agent"] = w(hold, aid, ball["bsb_agent"])
        ball["bsb_team"] = w(hold, a["team"], ball["bsb_team"])
        ball["bspv"] = w(hold, spv, ball["bspv"])
        ball["blt_agent"] = w(hold, aid, ball["blt_agent"])
        ball["blt_team"] = w(hold, a["team"], ball["blt_team"])

    # ---------------- 7. moveBall (src/game.cpp:82-125) ----------------
    for i in range(A):
        holding = (ag[i]["has_ball"] == 1) & (ball["bgrabbed"] == 1) & \
            (ball["bholder"] == C.AGENT_IDS[i])
        ball["bpos_x"] = w(holding, ag[i]["pos_x"], ball["bpos_x"])
        ball["bpos_y"] = w(holding, ag[i]["pos_y"], ball["bpos_y"])
        ball["bpos_z"] = w(holding, ag[i]["pos_z"], ball["bpos_z"])
    bvlen = jnp.sqrt(ball["bvel_x"] ** 2 + ball["bvel_y"] ** 2 +
                     ball["bvel_z"] ** 2)
    free = (bvlen != 0.0) & (ball["bgrabbed"] != 1)
    ball["bpos_x"] = w(free, jnp.clip(ball["bpos_x"] + ball["bvel_x"], 0.0,
                                      cfg.grid_width), ball["bpos_x"])
    ball["bpos_y"] = w(free, jnp.clip(ball["bpos_y"] + ball["bvel_y"], 0.0,
                                      cfg.grid_height), ball["bpos_y"])
    ball["bpos_z"] = w(free, ball["bpos_z"] + ball["bvel_z"],
                       ball["bpos_z"])

    # -------- 8. updateCurrentShotPercentage (src/game.cpp:758-809) -------
    for i in range(A):
        a = ag[i]
        ax, ay = att_hoop_xy(i)
        dx = ax - a["pos_x"]
        dy = ay - a["pos_y"]
        dist_hoop = jnp.sqrt(dx * dx + dy * dy)
        d_def = jnp.full_like(dist_hoop, jnp.inf)
        for j in range(A):
            is_def = ag[j]["team"] != a["team"]
            ddx = a["pos_x"] - ag[j]["pos_x"]
            ddy = a["pos_y"] - ag[j]["pos_y"]
            dd = jnp.sqrt(ddx * ddx + ddy * ddy)
            d_def = w(is_def, jnp.minimum(d_def, dd), d_def)
        dist_sd = C.DIST_DEVIATION_PER_METER * dist_hoop
        def_sd = C.DEF_DEVIATION_PER_METER / d_def + 1e-4
        vel_sd = C.VEL_DEVIATION_FACTOR * jnp.sqrt(
            a["vel_x"] ** 2 + a["vel_y"] ** 2 + a["vel_z"] ** 2)
        final_sd = jnp.sqrt(dist_sd * dist_sd / 3.0 + def_sd * def_sd / 3.0 +
                            vel_sd * vel_sd / 3.0)
        max_make = tmath.atan(ZONE_R / dist_hoop)
        pct = tmath.erf(max_make / final_sd / math.sqrt(2.0))
        a["shot_pct"] = w(a["has_ball"] == 0, 0.0, pct)

    # ---------------- 9. score (src/game.cpp:873-953) ----------------
    for hi, (hx, hy) in enumerate(_hoop_geometry(cfg)):
        hid = C.HOOP_IDS[hi]
        dx = ball["bpos_x"] - hx
        dy = ball["bpos_y"] - hy
        scored = (jnp.sqrt(dx * dx + dy * dy) <= ZONE_R) & \
            (ball["binflight"] == 1)
        points = ball["bspv"]
        inb_team = jnp.zeros_like(ball["bspv"])
        for j in range(A):
            defends = ag[j]["defend_hoop"] == hid
            inb_team = w(defends, ag[j]["team"], inb_team)
            shooter = scored & (C.AGENT_IDS[j] == ball["bsb_agent"])
            delta = w(defends, -points, points).astype(F32)
            ag[j]["stat_points"] = ag[j]["stat_points"] + \
                w(shooter, delta, 0.0)
        is_t0 = hid == game["t0hoop"]
        game["t1score"] = game["t1score"] + \
            w(scored & is_t0, points.astype(F32), 0.0)
        game["t0score"] = game["t0score"] + \
            w(scored & (~is_t0), points.astype(F32), 0.0)
        game["sbaskets"] = game["sbaskets"] + w(scored, 1.0, 0.0)
        spot_x = w(is_t0, C.COURT_MIN_X, C.COURT_MAX_X).astype(F32)
        spot_y = jnp.full_like(spot_x, hy + C.PIXELS_PER_METER / 60.0)
        ball["binflight"] = w(scored, 0, ball["binflight"])
        for n in ("bvel_x", "bvel_y", "bvel_z"):
            ball[n] = w(scored, 0.0, ball[n])
        ball["bsb_agent"] = w(scored, PLACEHOLDER, ball["bsb_agent"])
        ball["bsb_team"] = w(scored, PLACEHOLDER, ball["bsb_team"])
        ball["bspv"] = w(scored, 2, ball["bspv"])
        ball["bsgi"] = w(scored, 0, ball["bsgi"])
        full = scored & (game["is1v1"] == 0)
        ball["bpos_x"] = w(full, spot_x, ball["bpos_x"])
        ball["bpos_y"] = w(full, spot_y, ball["bpos_y"])
        ball["bpos_z"] = w(full, 0.0, ball["bpos_z"])
        cx, cy2 = _to_center(cfg, spot_x, spot_y)
        qw, _, _, qz = _rot_fwd_to(cx, cy2)
        _assign_inbounder(cfg, ag, ball, game, full, inb_team, spot_x,
                          spot_y, jnp.zeros_like(spot_x), qw, qz,
                          is_oob=False)
        one = scored & (game["is1v1"] != 0)
        game["reset_now"] = w(one, 1, game["reset_now"])

    # ---------------- 10. outOfBounds (src/game.cpp:1055-1113) ------------
    oob = ((ball["bpos_x"] < C.COURT_MIN_X) |
           (ball["bpos_x"] > C.COURT_MAX_X) |
           (ball["bpos_y"] < C.COURT_MIN_Y) |
           (ball["bpos_y"] > C.COURT_MAX_Y))
    trigger = oob & (game["ginb"] == 0)
    one = trigger & (game["is1v1"] == 1)
    off1 = ag[1]["team"].astype(F32) == game["tip"]
    pen = w(one, -100.0, 0.0)
    ag[0]["reward"] = ag[0]["reward"] + w(off1, 0.0, pen)
    ag[1]["reward"] = ag[1]["reward"] + w(off1, pen, 0.0)
    game["reset_now"] = w(one, 1, game["reset_now"])

    full = trigger & (game["is1v1"] != 1)
    ball["binflight"] = w(full, 0, ball["binflight"])
    for n in ("bvel_x", "bvel_y", "bvel_z"):
        ball[n] = w(full, 0.0, ball[n])
    game["glive"] = w(full, 0, game["glive"])
    new_team = (1 - ball["blt_team"]).astype(I32)
    for i in range(A):
        a = ag[i]
        carrier = full & (a["has_ball"] == 1) & (a["held_ball"] == C.BALL_ID)
        cx, cy2 = _to_center(cfg, a["pos_x"], a["pos_y"])
        a["pos_x"] = w(carrier, a["pos_x"] + cx, a["pos_x"])
        a["pos_y"] = w(carrier, a["pos_y"] + cy2, a["pos_y"])
        a["has_ball"] = w(carrier, 0, a["has_ball"])
        a["held_ball"] = w(carrier, PLACEHOLDER, a["held_ball"])
    cx, cy2 = _to_center(cfg, ball["bpos_x"], ball["bpos_y"])
    qw, _, _, qz = _rot_fwd_to(cx, cy2)
    _assign_inbounder(cfg, ag, ball, game, full, new_team, ball["bpos_x"],
                      ball["bpos_y"], ball["bpos_z"], qw, qz, is_oob=True)

    # ---------------- 11. updateLastTouch (src/game.cpp:1034-1051) --------
    for i in range(A):
        dx = ball["bpos_x"] - ag[i]["pos_x"]
        dy = ball["bpos_y"] - ag[i]["pos_y"]
        dz = ball["bpos_z"] - ag[i]["pos_z"]
        touch = jnp.sqrt(dx * dx + dy * dy + dz * dz) <= C.AGENT_SIZE_M
        ball["blt_agent"] = w(touch, C.AGENT_IDS[i], ball["blt_agent"])
        ball["blt_team"] = w(touch, ag[i]["team"], ball["blt_team"])

    # ---------------- 12. clock (src/game.cpp:992-1030) ----------------
    run = (game["glive"] > 0) & (game["gclock"] > 0.0)
    game["gclock"] = w(run, game["gclock"] - DT, game["gclock"])
    game["sclock"] = w(run, game["sclock"] - DT, game["sclock"])
    game["iclock"] = w(game["ginb"] > 0, game["iclock"] - DT,
                       game["iclock"])
    expire = (game["gclock"] <= 0.0) & (game["glive"] > 0)
    off1 = ag[1]["team"].astype(F32) == game["tip"]
    bonus = w(expire, 10.0, 0.0)
    ag[0]["reward"] = ag[0]["reward"] + w(off1, 0.0, bonus)
    ag[1]["reward"] = ag[1]["reward"] + w(off1, bonus, 0.0)
    game["reset_now"] = w(expire, 1, game["reset_now"])
    game["sclock"] = w(game["sclock"] < 0.0, 0.0, game["sclock"])

    # -------- 13. inboundViolation (src/game.cpp:1116-1157) --------
    trig = (game["ginb"] > 0) & (game["iclock"] <= 0.0)
    new_team = (1 - game["tip"].astype(I32)).astype(I32)
    game["glive"] = w(trig, 0, game["glive"])
    ball_to_turnover = jnp.full_like(ball["bholder"], PLACEHOLDER)
    for i in range(A):
        a = ag[i]
        was = trig & (a["im_inb"] > 0)
        ball_to_turnover = w(was, a["held_ball"], ball_to_turnover)
        cx, cy2 = _to_center(cfg, a["pos_x"], a["pos_y"])
        a["im_inb"] = w(was, 0, a["im_inb"])
        a["has_ball"] = w(was, 0, a["has_ball"])
        a["held_ball"] = w(was, PLACEHOLDER, a["held_ball"])
        a["pos_x"] = w(was, a["pos_x"] + cx, a["pos_x"])
        a["pos_y"] = w(was, a["pos_y"] + cy2, a["pos_y"])
    do_t = trig & (ball_to_turnover == C.BALL_ID)
    ball["bgrabbed"] = w(do_t, 0, ball["bgrabbed"])
    ball["bholder"] = w(do_t, PLACEHOLDER, ball["bholder"])
    cx, cy2 = _to_center(cfg, ball["bpos_x"], ball["bpos_y"])
    qw, _, _, qz = _rot_fwd_to(cx, cy2)
    _assign_inbounder(cfg, ag, ball, game, do_t, new_team, ball["bpos_x"],
                      ball["bpos_y"], ball["bpos_z"], qw, qz, is_oob=True)

    # ---------------- 14. reset (src/game.cpp:957-967) ----------------
    do = game["reset_now"] == 1
    r_ag, r_ball, r_game, r_hoops = _reset_world_fields(
        cfg, ag, ball, game, hoops, noise)
    for i in range(A):
        for k in ag[i]:
            ag[i][k] = w(do, r_ag[i][k], ag[i][k])
    for k in ball:
        ball[k] = w(do, r_ball[k], ball[k])
    for k in game:
        game[k] = w(do, r_game[k], game[k])
    for k in hoops:
        hoops[k] = w(do, r_hoops[k], hoops[k])
    game["reset_now"] = w(do, 0, game["reset_now"])

    # -------- 15. updatePointsWorth (src/game.cpp:129-161) --------
    hoops_geom = _hoop_geometry(cfg)
    for i in range(A):
        is0 = ag[i]["defend_hoop"] == C.HOOP_IDS[0]
        ag[i]["points_worth"] = w(
            is0,
            _shot_point_value(cfg, ag[i]["pos_x"], ag[i]["pos_y"],
                              hoops_geom[1], left_hoop=False),
            _shot_point_value(cfg, ag[i]["pos_x"], ag[i]["pos_y"],
                              hoops_geom[0], left_hoop=True))

    # -------- 16. agentCollision (src/game.cpp:537-648) --------
    def rect_axes(a):
        fx, fy, _ = _fwd_from_quat(a["quat_w"], a["quat_x"], a["quat_y"],
                                   a["quat_z"])
        rx, ry = fy, -fx
        return fx, fy, rx, ry

    fxa, fya, rxa, rya = rect_axes(ag[0])
    fxb, fyb, rxb, ryb = rect_axes(ag[1])
    HW = C.AGENT_SHOULDER_WIDTH / 2.0
    HD = C.AGENT_DEPTH / 2.0

    def corners(cx, cy, fx, fy, rx, ry):
        # (-d+w, -d-w, +d-w, +d+w), matching src/game.cpp:564-569
        return ((cx - fx * HD + rx * HW, cy - fy * HD + ry * HW),
                (cx - fx * HD - rx * HW, cy - fy * HD - ry * HW),
                (cx + fx * HD - rx * HW, cy + fy * HD - ry * HW),
                (cx + fx * HD + rx * HW, cy + fy * HD + ry * HW))

    va = corners(ag[0]["pos_x"], ag[0]["pos_y"], fxa, fya, rxa, rya)
    vb = corners(ag[1]["pos_x"], ag[1]["pos_y"], fxb, fyb, rxb, ryb)

    def norm_axis(x, y):
        inv = _rsqrt_safe(x * x + y * y)
        return x * inv, y * inv

    axes = [norm_axis(rxa, rya), norm_axis(fxa, fya),
            norm_axis(rxb, ryb), norm_axis(fxb, fyb)]
    colliding = jnp.ones_like(fxa, dtype=jnp.bool_)
    min_ov = jnp.full_like(fxa, 3.4028235e38)
    mtv_x = jnp.zeros_like(fxa)
    mtv_y = jnp.zeros_like(fxa)
    for axx, axy in axes:
        pa = [cx * axx + cy * axy for cx, cy in va]
        pb = [cx * axx + cy * axy for cx, cy in vb]
        pa_min = jnp.minimum(jnp.minimum(pa[0], pa[1]),
                             jnp.minimum(pa[2], pa[3]))
        pa_max = jnp.maximum(jnp.maximum(pa[0], pa[1]),
                             jnp.maximum(pa[2], pa[3]))
        pb_min = jnp.minimum(jnp.minimum(pb[0], pb[1]),
                             jnp.minimum(pb[2], pb[3]))
        pb_max = jnp.maximum(jnp.maximum(pb[0], pb[1]),
                             jnp.maximum(pb[2], pb[3]))
        colliding = colliding & (pa_max > pb_min) & (pb_max > pa_min)
        overlap = jnp.minimum(pa_max, pb_max) - jnp.maximum(pa_min, pb_min)
        smaller = overlap < min_ov
        min_ov = w(smaller, overlap, min_ov)
        mtv_x = w(smaller, axx, mtv_x)
        mtv_y = w(smaller, axy, mtv_y)
    if cfg.tag_mode:
        hit = colliding & (game["tip"] == ag[0]["team"].astype(F32))
        ag[0]["reward"] = ag[0]["reward"] + w(hit, -10.0, 0.0)
        ag[1]["reward"] = ag[1]["reward"] + w(hit, 10.0, 0.0)
        game["reset_now"] = w(hit, 1, game["reset_now"])
    c2cx = ag[1]["pos_x"] - ag[0]["pos_x"]
    c2cy = ag[1]["pos_y"] - ag[0]["pos_y"]
    flip = (c2cx * mtv_x + c2cy * mtv_y) < 0.0
    mtv_x = w(flip, -mtv_x, mtv_x)
    mtv_y = w(flip, -mtv_y, mtv_y)
    corr_x = mtv_x * min_ov * 0.5
    corr_y = mtv_y * min_ov * 0.5
    ag[0]["pos_x"] = w(colliding, ag[0]["pos_x"] - corr_x, ag[0]["pos_x"])
    ag[0]["pos_y"] = w(colliding, ag[0]["pos_y"] - corr_y, ag[0]["pos_y"])
    ag[1]["pos_x"] = w(colliding, ag[1]["pos_x"] + corr_x, ag[1]["pos_x"])
    ag[1]["pos_y"] = w(colliding, ag[1]["pos_y"] + corr_y, ag[1]["pos_y"])

    # -------- 17. hardCodeDefense (src/game.cpp:651-755) --------
    for i in range(A):
        a = ag[i]
        on_off = game["tip"] == a["team"].astype(F32)
        found = jnp.zeros_like(on_off)
        off_x = jnp.zeros_like(a["pos_x"])
        off_y = jnp.zeros_like(a["pos_y"])
        for j in range(A):
            hit = (ag[j]["has_ball"] == 1) & (~found)
            off_x = w(hit, ag[j]["pos_x"], off_x)
            off_y = w(hit, ag[j]["pos_y"], off_y)
            found = found | hit
        is0 = a["defend_hoop"] == C.HOOP_IDS[0]
        mhx = w(is0, h0x, h1x)
        mhy = w(is0, h0y, h1y)
        hdx = mhx - off_x
        hdy = mhy - off_y
        hlen2 = hdx * hdx + hdy * hdy
        inv = _rsqrt_safe(hlen2)
        gx = w(hlen2 > 1e-6, off_x + C.GUARDING_DISTANCE * hdx * inv, off_x)
        gy = w(hlen2 > 1e-6, off_y + C.GUARDING_DISTANCE * hdy * inv, off_y)
        chase = (~on_off) & found
        interp = a["reaction"] * DT
        tx = w(chase, a["target_x"] + (gx - a["target_x"]) * interp,
               a["target_x"])
        ty = w(chase, a["target_y"] + (gy - a["target_y"]) * interp,
               a["target_y"])
        mvx = tx - a["pos_x"]
        mvy = ty - a["pos_y"]
        mvz = a["target_z"] - a["pos_z"]
        small = (mvx * mvx + mvy * mvy + mvz * mvz) < 0.01
        act_move = chase & (~small)
        dinv = _rsqrt_safe(mvx * mvx + mvy * mvy + mvz * mvz)
        dx_n = mvx * dinv
        dy_n = mvy * dinv
        best = jnp.zeros_like(a["a_angle"])
        max_dot = jnp.full_like(dx_n, -2.0)
        for k, (ddx, ddy) in enumerate(MOVE_DIRS):
            cur = dx_n * ddx + dy_n * ddy
            better = cur > max_dot
            max_dot = w(better, cur, max_dot)
            best = w(better, k, best)
        ovx, ovy, _ = _fwd_from_quat(a["quat_w"], a["quat_x"], a["quat_y"],
                                     a["quat_z"])
        # acos(dot) > pi/8  <=>  dot < cos(pi/8)
        big_angle = (ovx * dx_n + ovy * dy_n) < COS_PI_8
        cross = ovx * mvy - ovy * mvx
        rot = w(cross < 0.0, -1, w(cross > 0.0, 1, 0)).astype(I32)
        rot = w(big_angle, rot, 0)
        move = w(on_off, 0, w(~found, 0, w(small, 0, 1))).astype(I32)
        a["a_move"] = move
        a["a_angle"] = w(act_move, best, a["a_angle"])
        a["a_rotate"] = w(act_move, rot, a["a_rotate"])
        a["a_grab"] = w(on_off, a["a_grab"], 1)
        a["target_x"] = tx
        a["target_y"] = ty

    # -------- 18. fillObservations (src/game.cpp:1175-1461) --------
    if not compute_obs:
        # ---------- 19. reward (src/game.cpp:811-870) ----------
        _reward_fields(ag, ball, game)
        return ag, ball, game, hoops, []

    inbounder = jnp.full_like(ball["bholder"], -1)
    for j in range(A):
        inbounder = w(ag[j]["im_inb"] > 0, C.AGENT_IDS[j], inbounder)

    def agent_block(tgt, hoop_x, hoop_y, self_block, rel_to=None):
        """The 38-float per-agent block; returns a list of (L,) rows."""
        rows = [tgt["pos_x"], tgt["pos_y"], tgt["pos_z"]]
        if self_block:
            z = jnp.zeros_like(tgt["pos_x"])
            rows += [z, z, z, z]
        else:
            rx = tgt["pos_x"] - rel_to["pos_x"]
            ry = tgt["pos_y"] - rel_to["pos_y"]
            rz = tgt["pos_z"] - rel_to["pos_z"]
            r2 = rx * rx + ry * ry + rz * rz
            inv = _rsqrt_safe(r2)
            ok = r2 > 1e-6
            rows += [w(ok, rx * inv, 0.0), w(ok, ry * inv, 0.0),
                     w(ok, rz * inv, 0.0), jnp.sqrt(r2)]
        rows += [tgt["quat_w"], tgt["quat_x"], tgt["quat_y"], tgt["quat_z"]]
        ox, oy, oz = _fwd_from_quat(tgt["quat_w"], tgt["quat_x"],
                                    tgt["quat_y"], tgt["quat_z"])
        rows += [ox, oy, oz]
        vx, vy, vz = tgt["vel_x"], tgt["vel_y"], tgt["vel_z"]
        v2 = vx * vx + vy * vy + vz * vz
        inv = _rsqrt_safe(v2)
        okv = v2 > 1e-6
        vnx, vny, vnz = (w(okv, vx * inv, 0.0), w(okv, vy * inv, 0.0),
                         w(okv, vz * inv, 0.0))
        rows += [vnx, vny, vnz, jnp.sqrt(v2)]
        dot = w(okv, vnx * ox + vny * oy + vnz * oz, 0.0)
        rows += [dot, w(dot <= 0.8, 0.1, 1.0)]
        hdx = hoop_x - tgt["pos_x"]
        hdy = hoop_y - tgt["pos_y"]
        hdz = -tgt["pos_z"]
        h2 = hdx * hdx + hdy * hdy + hdz * hdz
        hd = jnp.sqrt(h2)
        inv = _rsqrt_safe(h2)
        okh = hd > 1e-6
        rows += [w(okh, hdx * inv, 0.0), w(okh, hdy * inv, 0.0),
                 w(okh, hdz * inv, 0.0), hd]
        bdx = ball["bpos_x"] - tgt["pos_x"]
        bdy = ball["bpos_y"] - tgt["pos_y"]
        bdz = ball["bpos_z"] - tgt["pos_z"]
        b2 = bdx * bdx + bdy * bdy + bdz * bdz
        bd = jnp.sqrt(b2)
        inv = _rsqrt_safe(b2)
        okb = bd > 1e-6
        rows += [w(okb, bdx * inv, 0.0), w(okb, bdy * inv, 0.0),
                 w(okb, bdz * inv, 0.0), bd]
        rows += [tgt["im_inb"].astype(F32), tgt["cooldown"],
                 tgt["max_speed"], tgt["quickness"], tgt["shooting"],
                 tgt["ft_pct"], tgt["reaction"], tgt["shot_pct"],
                 tgt["points_worth"].astype(F32),
                 tgt["has_ball"].astype(F32)]
        return rows

    obs_rows = []
    zero = jnp.zeros_like(ball["bpos_x"])
    for i in range(A):
        a = ag[i]
        ax, ay = att_hoop_xy(i)
        dx_, dy_ = def_hoop_xy(i)
        own0 = a["team"] == 0
        rows = [game["gclock"], game["sclock"], game["period"],
                game["ginb"].astype(F32), game["iclock"],
                w(own0, game["t0score"], game["t1score"]),
                w(own0, game["t1score"], game["t0score"]),
                ball["bpos_x"], ball["bpos_y"], ball["bpos_z"],
                ball["bvel_x"], ball["bvel_y"], ball["bvel_z"],
                ball["bgrabbed"].astype(F32), ball["binflight"].astype(F32),
                ball["bspv"].astype(F32), ball["blt_team"].astype(F32),
                ax, ay, zero, dx_, dy_, zero]
        rows += agent_block(a, ax, ay, self_block=True)
        for j in range(A):
            if j == i:
                continue
            rows += agent_block(ag[j], dx_, dy_, self_block=False,
                                rel_to=a)
        for j in range(A):
            rows.append((jnp.asarray(C.AGENT_IDS[j], I32) ==
                         ball["bholder"]).astype(F32))
        for j in range(A):
            rows.append((jnp.asarray(C.AGENT_IDS[j], I32) ==
                         inbounder).astype(F32))
        assert len(rows) == C.OBS_USED, \
            f"obs layout changed: {len(rows)} used rows != C.OBS_USED"
        while len(rows) < C.OBS_SIZE:
            rows.append(zero)
        obs_rows.extend(rows)

    # ---------------- 19. reward (src/game.cpp:811-870) ----------------
    _reward_fields(ag, ball, game)

    return ag, ball, game, hoops, obs_rows


def _reward_fields(ag, ball, game):
    """System 19 (src/game.cpp:811-870) over field vectors; mutates ag."""
    w = jnp.where
    for i in range(A):
        a = ag[i]
        o = ag[1 - i]
        ddx = o["pos_x"] - a["pos_x"]
        ddy = o["pos_y"] - a["pos_y"]
        ddz = o["pos_z"] - a["pos_z"]
        dist_other = jnp.sqrt(ddx * ddx + ddy * ddy + ddz * ddz)
        on_off = a["team"].astype(F32) == game["tip"]
        off_act = on_off & (game["gclock"] > 5.0)
        mine = ball["bsb_agent"] == C.AGENT_IDS[i]
        made = mine & (ball["bsgi"] == 1)
        missing = mine & (ball["bsgi"] == 0) & (ball["binflight"] == 1)
        r = a["reward"]
        r = r + w(off_act & made, ball["bspv"].astype(F32), 0.0)
        r = r - w(off_act & missing, 1.0, 0.0)
        r = r + w(off_act, a["shot_pct"], 0.0)
        r = r + w(~on_off, -1.0 + jnp.exp(-0.4 * dist_other), 0.0)
        a["reward"] = r


# =====================================================================
# Dict <-> matrix plumbing
# =====================================================================

def _load_dicts(sf, si):
    """Rows of SF/SI -> field dicts.  Works on arrays and pallas refs."""
    ag = []
    for i in range(A):
        d = {}
        for n in AGENT_F32:
            d[n] = sf[F_IDX[f"a{i}.{n}"]]
        for n in AGENT_I32:
            d[n] = si[I_IDX[f"a{i}.{n}"]]
        ag.append(d)
    ball = {n: sf[F_IDX[n]] for n in BALL_F32}
    ball.update({n: si[I_IDX[n]] for n in BALL_I32})
    game = {n: sf[F_IDX[n]] for n in GAME_F32}
    game.update({n: si[I_IDX[n]] for n in GAME_I32})
    hoops = {n: sf[F_IDX[n]] for n in HOOP_F32}
    hoops.update({n: si[I_IDX[n]] for n in HOOP_I32})
    return ag, ball, game, hoops


def _noise_dict(noise):
    return {
        "shot": [[noise[3 * i + k] for k in range(3)] for i in range(A)],
        "reset_x": noise[3 * A + 0],
        "reset_y": noise[3 * A + 1],
        "reset_angle": noise[3 * A + 2],
    }


def _store_rows(ag, ball, game, hoops):
    sf = [None] * N_F32_ROWS
    si = [None] * N_I32_ROWS
    for i in range(A):
        for n in AGENT_F32:
            sf[F_IDX[f"a{i}.{n}"]] = ag[i][n].astype(F32)
        for n in AGENT_I32:
            si[I_IDX[f"a{i}.{n}"]] = ag[i][n].astype(I32)
    for n in BALL_F32:
        sf[F_IDX[n]] = ball[n].astype(F32)
    for n in BALL_I32:
        si[I_IDX[n]] = ball[n].astype(I32)
    for n in GAME_F32:
        sf[F_IDX[n]] = game[n].astype(F32)
    for n in GAME_I32:
        si[I_IDX[n]] = game[n].astype(I32)
    for n in HOOP_F32:
        sf[F_IDX[n]] = hoops[n].astype(F32)
    for n in HOOP_I32:
        si[I_IDX[n]] = hoops[n].astype(I32)
    return sf, si


@functools.partial(jax.jit, static_argnums=0)
def fused_step_xla(cfg: SimConfig, sf, si, noise):
    """Pure-XLA reference path over full (W,) rows (used for validation and
    as a CPU fallback).  Returns (sf', si', obs_rows (A*128, W))."""
    ag, ball, game, hoops = _load_dicts(sf, si)
    ag, ball, game, hoops, obs = step_fields(cfg, ag, ball, game, hoops,
                                             _noise_dict(noise))
    sf2, si2 = _store_rows(ag, ball, game, hoops)
    return jnp.stack(sf2), jnp.stack(si2), jnp.stack(obs)


MAX_BLOCK = 4096  # VMEM budget: ~780 row-vectors live at once; 4096 lanes
# of f32 keeps the scoped allocation under the 16 MB VMEM limit.


def pick_block(num_worlds: int, block: int = 2048,
               max_block: int = MAX_BLOCK) -> int:
    """World-block size for the Pallas kernels.

    Mosaic requires the lane (world) block to be a multiple of 128 that
    divides num_worlds, OR the whole array.  Prefers the requested size,
    walks down in 128-lane steps, and falls back to one whole-array block
    when num_worlds fits in VMEM."""
    block = min(block, num_worlds, max_block)
    if block == num_worlds:
        return block
    b = (block // 128) * 128
    while b >= 128:
        if num_worlds % b == 0:
            return b
        b -= 128
    if num_worlds <= max_block:
        return num_worlds
    raise ValueError(
        f"num_worlds={num_worlds} cannot be split into TPU world blocks "
        f"(needs num_worlds <= {max_block} or a divisor that is a "
        f"multiple of 128); pad the world count, e.g. to a power of two")


def make_fused_step(cfg: SimConfig, num_worlds: int, block: int = 2048,
                    interpret: bool = False):
    """Build the single-kernel Pallas step: (sf, si, noise) -> (sf', si',
    obs)."""
    block = pick_block(num_worlds, block)
    grid = (num_worlds // block,)

    def kernel(noise_ref, sf_ref, si_ref, sf_out, si_out, obs_out):
        sf = [sf_ref[r, :] for r in range(N_F32_ROWS)]
        si = [si_ref[r, :] for r in range(N_I32_ROWS)]
        noise = [noise_ref[r, :] for r in range(N_NOISE_ROWS)]
        ag, ball, game, hoops = _load_dicts(sf, si)
        ag, ball, game, hoops, obs = step_fields(cfg, ag, ball, game, hoops,
                                                 _noise_dict(noise))
        sf2, si2 = _store_rows(ag, ball, game, hoops)
        for r in range(N_F32_ROWS):
            sf_out[r, :] = sf2[r]
        for r in range(N_I32_ROWS):
            si_out[r, :] = si2[r]
        for r in range(N_OBS_ROWS):
            obs_out[r, :] = obs[r]

    def block_spec(rows):
        return pl.BlockSpec((rows, block), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[block_spec(N_NOISE_ROWS), block_spec(N_F32_ROWS),
                  block_spec(N_I32_ROWS)],
        out_specs=[block_spec(N_F32_ROWS), block_spec(N_I32_ROWS),
                   block_spec(N_OBS_ROWS)],
        out_shape=[
            jax.ShapeDtypeStruct((N_F32_ROWS, num_worlds), F32),
            jax.ShapeDtypeStruct((N_I32_ROWS, num_worlds), I32),
            jax.ShapeDtypeStruct((N_OBS_ROWS, num_worlds), F32),
        ],
        interpret=interpret,
    )

    def step(sf, si, noise):
        return call(noise, sf, si)

    return step


# =====================================================================
# Multi-step kernel: K ticks per launch, state resident in VMEM
# =====================================================================
#
# The single-step kernel is HBM-bound: every launch reads the 131 state
# rows + 9 noise rows and writes 131 state + 256 obs rows (~17 MB per
# fleet step at 8192 worlds).  The whole fleet state is only ~4 MB, so a
# kernel that loops K ticks over the VMEM-resident block amortizes that
# traffic K-fold.  Noise comes from the on-chip PRNG (pltpu.prng_seed /
# prng_random_bits) — same per-draw distributions as engine.step's
# jax.random draws (U(-1,1) x8, U(0,1) x1; SURVEY §2.3: only
# distribution parity is required, the reference's RNG is unavailable).
# Observations are only materialized on the final tick (no other system
# reads them — src/game.cpp:1518-1523 ordering).
#
# This is the production shape for blank/held-action stepping
# (scripts/run.py semantics) and for eval bursts between policy reads;
# training rollouts need per-tick policy actions and use the
# single-step kernel inside lax.scan instead.

def _bits_to_unit(bits_u32):
    """uint32 random bits -> f32 uniform in [0, 1): set the exponent to
    1.0's and fill the mantissa with 23 random bits, subtract 1."""
    mant = jax.lax.shift_right_logical(bits_u32, jnp.uint32(9))
    fb = pltpu.bitcast(mant | jnp.uint32(0x3F800000), jnp.float32)
    return fb - 1.0


def _prng_noise_rows(field_shape):
    """Draw the 9 noise rows from the per-core PRNG: rows 0..7 ~ U(-1,1)
    (shot deviations + reset x/y), row 8 ~ U(0,1) (defender angle)."""
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((N_NOISE_ROWS,) + tuple(field_shape)),
        jnp.uint32)
    u = _bits_to_unit(bits)
    rows = [2.0 * u[r] - 1.0 for r in range(N_NOISE_ROWS - 1)]
    rows.append(u[N_NOISE_ROWS - 1])
    return rows


NOISE_CHUNK = 16  # per-step noise stride in the external-noise matrix:
# Mosaic requires dynamic sublane offsets provably divisible by 8, so the
# 9 noise rows of each step are padded to a 16-row chunk.


def pack_multistep_noise(noise_steps):
    """Stack K (N_NOISE_ROWS, W) matrices into the (K * NOISE_CHUNK, W)
    layout the external-noise multistep kernel reads."""
    padded = [jnp.pad(n, ((0, NOISE_CHUNK - N_NOISE_ROWS), (0, 0)))
              for n in noise_steps]
    return jnp.concatenate(padded, axis=0)


def make_fused_multistep(cfg: SimConfig, num_worlds: int, n_steps: int,
                         block: int = 2048, interpret: bool = False,
                         external_noise: bool = False,
                         obs_every_tick: bool = False,
                         blank_agent: int | None = None):
    """Build the K-step Pallas kernel.

    Returns step(seed, sf, si) -> (sf', si', obs) advancing every world
    n_steps ticks; `seed` is a single (1,) int32 — the kernel folds the
    block index into the PRNG seed itself, so callers never have to know
    the internal block/grid split.  With external_noise=True the kernel
    instead takes a precomputed (n_steps * NOISE_CHUNK, W) noise matrix
    (see pack_multistep_noise) in place of the seed — used by tests to
    prove K-step == K x single-step on identical draws.

    obs_every_tick=True runs fillObservations (system 18) on EVERY tick
    and stores the 256 obs rows into the (VMEM-resident) obs output block
    each tick, overwriting — the reference executes fillObservations
    every step (src/game.cpp:1518) and exports obs into the same buffer,
    so this is the honest per-tick workload for benchmarking.  With
    False (default), intermediate ticks skip system 18 (nothing else
    reads obs within the chain) — the fast shape for eval bursts where
    only the final observation matters.

    blank_agent=i zeroes agent i's six action rows at the start of every
    tick — the per-step trainee zero-write of the reference benchmark
    (scripts/run.py:13-14 via scripts/env.py:125-147; the other agent
    keeps whatever hardCodeDefense assigned, as there).

    Layout: when the world count allows (W % 1024 == 0), each field is
    processed as an (8, W/8) 2-D tile instead of a (W,) row — a 1-D row
    occupies only 1 of the 8 sublanes of every f32 vreg, so 2-D tiles
    run the same elementwise math at up to ~5x the VPU throughput
    (measured on v5e).  The (rows, W) <-> (rows, 8, W/8) reshapes happen
    once per launch and amortize over the K ticks.
    """
    assert n_steps >= 1, "multistep kernel needs at least one tick"
    # Each field's live temporaries scale with worlds-per-block; blocks of
    # 2048 worlds keep the kernel inside the 16 MB scoped VMEM budget
    # (4096 overflows by ~0.5 MB with in+out+obs blocks resident).
    layout2d = num_worlds % 1024 == 0
    if layout2d:
        cols = num_worlds // 8
        # A column block needs >= 128 lanes; requests below that (block <
        # 1024 worlds) clamp up rather than error.
        blk_c = pick_block(cols, max(min(block, 2048) // 8, 128),
                           max_block=384)
        grid = (cols // blk_c,)
        field_shape = (8, blk_c)

        def in3d(x, rows):
            return x.reshape(rows, 8, cols)

        def spec3(rows):
            return pl.BlockSpec((rows, 8, blk_c), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)

        state_specs = [spec3(N_F32_ROWS), spec3(N_I32_ROWS)]
        out_specs = [spec3(N_F32_ROWS), spec3(N_I32_ROWS),
                     spec3(N_OBS_ROWS)]
        out_shape = [
            jax.ShapeDtypeStruct((N_F32_ROWS, 8, cols), F32),
            jax.ShapeDtypeStruct((N_I32_ROWS, 8, cols), I32),
            jax.ShapeDtypeStruct((N_OBS_ROWS, 8, cols), F32),
        ]
        rng_spec = (spec3(n_steps * NOISE_CHUNK) if external_noise
                    else pl.BlockSpec(memory_space=pltpu.SMEM))
    else:
        blk = pick_block(num_worlds, min(block, 2048), max_block=3072)
        grid = (num_worlds // blk,)
        field_shape = (blk,)

        def in3d(x, rows):
            return x

        def spec2(rows):
            return pl.BlockSpec((rows, blk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        state_specs = [spec2(N_F32_ROWS), spec2(N_I32_ROWS)]
        out_specs = [spec2(N_F32_ROWS), spec2(N_I32_ROWS),
                     spec2(N_OBS_ROWS)]
        out_shape = [
            jax.ShapeDtypeStruct((N_F32_ROWS, num_worlds), F32),
            jax.ShapeDtypeStruct((N_I32_ROWS, num_worlds), I32),
            jax.ShapeDtypeStruct((N_OBS_ROWS, num_worlds), F32),
        ]
        rng_spec = (spec2(n_steps * NOISE_CHUNK) if external_noise
                    else pl.BlockSpec(memory_space=pltpu.SMEM))

    def kernel(rng_ref, sf_in, si_in, sf_out, si_out, obs_out):
        if not external_noise:
            # Distinct stream per (caller seed, block): prng_seed hashes
            # all its operands together.
            pltpu.prng_seed(rng_ref[0], pl.program_id(0))
        sf_out[...] = sf_in[...]
        si_out[...] = si_in[...]

        blank_rows = [] if blank_agent is None else [
            I_IDX[f"a{blank_agent}.{n}"] for n in
            ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
             "a_shoot")]

        def tick(t, compute_obs):
            for r in blank_rows:
                si_out[r] = jnp.zeros_like(si_out[r])
            sf = [sf_out[r] for r in range(N_F32_ROWS)]
            si = [si_out[r] for r in range(N_I32_ROWS)]
            if external_noise:
                chunk = rng_ref[pl.ds(t * NOISE_CHUNK, NOISE_CHUNK)]
                noise = [chunk[r] for r in range(N_NOISE_ROWS)]
            else:
                noise = _prng_noise_rows(field_shape)
            ag, ball, game, hoops = _load_dicts(sf, si)
            ag, ball, game, hoops, obs = step_fields(
                cfg, ag, ball, game, hoops, _noise_dict(noise),
                compute_obs=compute_obs)
            sf2, si2 = _store_rows(ag, ball, game, hoops)
            for r in range(N_F32_ROWS):
                sf_out[r] = sf2[r]
            for r in range(N_I32_ROWS):
                si_out[r] = si2[r]
            if compute_obs:
                for r in range(N_OBS_ROWS):
                    obs_out[r] = obs[r]

        if obs_every_tick:
            def body(t, carry):
                tick(t, compute_obs=True)
                return carry

            jax.lax.fori_loop(0, n_steps, body, 0)
        else:
            def body(t, carry):
                tick(t, compute_obs=False)
                return carry

            jax.lax.fori_loop(0, n_steps - 1, body, 0)
            tick(n_steps - 1, compute_obs=True)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[rng_spec] + state_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )

    def step(rng, sf, si):
        if external_noise:
            rng = in3d(rng, n_steps * NOISE_CHUNK)
        sf2, si2, obs = call(rng, in3d(sf, N_F32_ROWS),
                             in3d(si, N_I32_ROWS))
        return (sf2.reshape(N_F32_ROWS, num_worlds),
                si2.reshape(N_I32_ROWS, num_worlds),
                obs.reshape(N_OBS_ROWS, num_worlds))

    return step
