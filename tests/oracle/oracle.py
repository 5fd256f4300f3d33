"""Scalar NumPy oracle of the reference simulation.

An *independent* imperative transcription of the C++ game systems
(src/game.cpp, src/gen.cpp, src/helper.cpp in /root/reference), written with
plain Python control flow, early returns, and in-place mutation — the same
shape as the original — so that the vectorized, branchless JAX engine can be
validated against it step-for-step.

RNG: instead of madrona's counter-based stream (unavailable — the engine
submodule is empty in the snapshot), the oracle consumes the same pre-drawn
uniforms as the JAX engine (`StepNoise`): shot_u[(agent), 3] in [-1, 1) and
reset_u[3].  All float math is float32 via NumPy NEP-50 promotion.
"""

from __future__ import annotations

import math

import numpy as np

from madrona_basketball_tpu import constants as C

F = np.float32
PLACEHOLDER = np.int32(C.ENTITY_ID_PLACEHOLDER)
FWD = np.array([0.0, 1.0, 0.0], F)


def v3(x=0.0, y=0.0, z=0.0):
    return np.array([x, y, z], F)


def length(v):
    return F(np.sqrt(F(v[0]) * v[0] + F(v[1]) * v[1] + F(v[2]) * v[2]))


def length2(v):
    return F(F(v[0]) * v[0] + F(v[1]) * v[1] + F(v[2]) * v[2])


def normalize(v):
    return (v / length(v)).astype(F)


def cross(a, b):
    return np.array([a[1] * b[2] - a[2] * b[1],
                     a[2] * b[0] - a[0] * b[2],
                     a[0] * b[1] - a[1] * b[0]], F)


def quat_id():
    return np.array([1.0, 0.0, 0.0, 0.0], F)


def quat_angle_axis(angle, axis):
    half = F(angle) * F(0.5)
    q = np.empty(4, F)
    q[0] = np.cos(half)
    q[1:] = np.asarray(axis, F) * np.sin(half)
    return q


def quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], F)


def quat_rotate(q, v):
    w = q[0]
    u = q[1:4]
    t = F(2.0) * cross(u, np.asarray(v, F))
    return (np.asarray(v, F) + w * t + cross(u, t)).astype(F)


def find_rotation_between_vectors(start, target):
    """src/helper.cpp:14-42."""
    s = normalize(np.asarray(start, F))
    t = normalize(np.asarray(target, F))
    d = F(np.dot(s, t))
    if d > 0.999999:
        return quat_id()
    if d < -0.999999:
        return quat_angle_axis(math.pi, v3(0, 0, 1))
    axis = normalize(cross(s, t))
    angle = F(np.arccos(d))
    return quat_angle_axis(angle, axis)


def get_shot_point_value(pos, hoop_zone):
    """src/helper.cpp:50-81."""
    distance = length(pos - hoop_zone)
    in_corner = (pos[1] < C.COURT_MIN_Y + C.CORNER_3_FROM_SIDELINE_M or
                 pos[1] > C.COURT_MIN_Y + C.COURT_WIDTH_M -
                 C.CORNER_3_FROM_SIDELINE_M)
    if in_corner:
        if hoop_zone[0] < C.WORLD_WIDTH_M / 2.0:
            if pos[0] <= C.COURT_MIN_X + C.CORNER_3_LENGTH_FROM_BASELINE_M:
                return 3
        else:
            if pos[0] >= (C.COURT_MIN_X + C.COURT_LENGTH_M -
                          C.CORNER_3_LENGTH_FROM_BASELINE_M):
                return 3
    if distance >= C.ARC_RADIUS_M:
        return 3
    return 2


class Agent:
    def __init__(self, i):
        self.id = np.int32(C.AGENT_IDS[i])
        self.pos = v3()
        self.vel = v3()
        self.orient = quat_id()
        self.action = np.zeros(6, np.int32)
        self.mask = np.zeros(4, np.int32)
        self.reset = np.int32(0)
        self.reward = F(0)
        self.done = F(0)
        self.cur_step = np.int32(0)
        self.has_ball = np.int32(0)
        self.held_ball_id = PLACEHOLDER
        self.points_worth = np.int32(2)
        self.im_inbounding = np.int32(0)
        self.team = np.int32(i % 2)
        self.team_color = v3()
        self.defending_hoop = np.int32(0)
        self.cooldown = F(0)
        self.stat_points = F(0)
        self.stat_fouls = F(0)
        self.max_speed = F(0)
        self.quickness = F(0)
        self.shooting = F(0)
        self.ft_pct = F(0)
        self.reaction = F(0)
        self.target_pos = v3()
        self.shot_pct = F(0)
        self.obs = np.zeros(128, F)


class Ball:
    def __init__(self):
        self.id = np.int32(C.BALL_ID)
        self.pos = v3()
        self.vel = v3()
        self.grabbed = np.int32(0)
        self.holder = PLACEHOLDER
        self.in_flight = np.int32(0)
        self.last_touched_agent = PLACEHOLDER
        self.last_touched_team = PLACEHOLDER
        self.shot_by_agent = PLACEHOLDER
        self.shot_by_team = PLACEHOLDER
        self.shot_point_value = np.int32(2)
        self.shot_going_in = np.int32(0)


class Hoop:
    def __init__(self, i, pos):
        self.id = np.int32(C.HOOP_IDS[i])
        self.pos = np.asarray(pos, F)
        self.zone_radius = F(C.HOOP_SCORE_ZONE_SIZE)
        self.zone_center = np.asarray(pos, F)


class Game:
    def __init__(self, cfg):
        self.inbounding_in_progress = np.int32(0)
        self.live_ball = np.int32(1)
        self.period = F(1)
        self.team_in_possession = F(0)
        self.team0_hoop = np.int32(C.HOOP_IDS[0])
        self.team0_score = F(0)
        self.team1_hoop = np.int32(C.HOOP_IDS[1])
        self.team1_score = F(0)
        self.game_clock = F(cfg.time_per_period)
        self.shot_clock = F(cfg.shot_clock_duration)
        self.scored_baskets = F(0)
        self.oob_count = F(0)
        self.inbound_clock = F(0)
        self.is_one_on_one = np.int32(1 if cfg.one_on_one else 0)


class OracleWorld:
    """One world, stepped imperatively exactly like the C++."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.dt = F(cfg.sim_dt)
        self.agents = [Agent(i) for i in range(cfg.num_agents)]
        self.ball = Ball()
        court_start_x = F(cfg.grid_width - C.COURT_LENGTH_M) / F(2.0)
        cy = F(cfg.grid_height / 2.0)
        self.hoops = [
            Hoop(0, v3(court_start_x + F(C.HOOP_FROM_BASELINE_M), cy, 0)),
            Hoop(1, v3(court_start_x + F(C.COURT_LENGTH_M) -
                       F(C.HOOP_FROM_BASELINE_M), cy, 0)),
        ]
        self.game = Game(cfg)
        self.reset_now = np.int32(0)

    # ----------------------------------------------------------------
    # sync with the JAX engine
    # ----------------------------------------------------------------
    def load_state(self, s):
        """Copy a single-world JAX State into the oracle."""
        a = s.agents
        for i, ag in enumerate(self.agents):
            ag.pos = np.asarray(a.pos[i], F).copy()
            ag.vel = np.asarray(a.vel[i], F).copy()
            ag.orient = np.asarray(a.orient[i], F).copy()
            ag.action = np.asarray(a.action[i], np.int32).copy()
            ag.mask = np.asarray(a.action_mask[i], np.int32).copy()
            ag.reset = np.int32(a.reset[i])
            ag.reward = F(a.reward[i])
            ag.done = F(a.done[i])
            ag.cur_step = np.int32(a.cur_step[i])
            ag.has_ball = np.int32(a.has_ball[i])
            ag.held_ball_id = np.int32(a.held_ball_id[i])
            ag.points_worth = np.int32(a.points_worth[i])
            ag.im_inbounding = np.int32(a.im_inbounding[i])
            ag.team = np.int32(a.team[i])
            ag.team_color = np.asarray(a.team_color[i], F).copy()
            ag.defending_hoop = np.int32(a.defending_hoop[i])
            ag.cooldown = F(a.grab_cooldown[i])
            ag.stat_points = F(a.stat_points[i])
            ag.stat_fouls = F(a.stat_fouls[i])
            ag.max_speed = F(a.max_speed[i])
            ag.quickness = F(a.quickness[i])
            ag.shooting = F(a.shooting[i])
            ag.ft_pct = F(a.ft_pct[i])
            ag.reaction = F(a.reaction_speed[i])
            ag.target_pos = np.asarray(a.target_pos[i], F).copy()
            ag.shot_pct = F(a.shot_pct[i])
            ag.obs = np.asarray(a.obs[i], F).copy()
        b = s.ball
        self.ball.pos = np.asarray(b.pos, F).copy()
        self.ball.vel = np.asarray(b.vel, F).copy()
        self.ball.grabbed = np.int32(b.grabbed)
        self.ball.holder = np.int32(b.holder)
        self.ball.in_flight = np.int32(b.in_flight)
        self.ball.last_touched_agent = np.int32(b.last_touched_agent)
        self.ball.last_touched_team = np.int32(b.last_touched_team)
        self.ball.shot_by_agent = np.int32(b.shot_by_agent)
        self.ball.shot_by_team = np.int32(b.shot_by_team)
        self.ball.shot_point_value = np.int32(b.shot_point_value)
        self.ball.shot_going_in = np.int32(b.shot_going_in)
        g = s.game
        gm = self.game
        gm.inbounding_in_progress = np.int32(g.inbounding_in_progress)
        gm.live_ball = np.int32(g.live_ball)
        gm.period = F(g.period)
        gm.team_in_possession = F(g.team_in_possession)
        gm.team0_score = F(g.team0_score)
        gm.team1_score = F(g.team1_score)
        gm.game_clock = F(g.game_clock)
        gm.shot_clock = F(g.shot_clock)
        gm.scored_baskets = F(g.scored_baskets)
        gm.oob_count = F(g.oob_count)
        gm.inbound_clock = F(g.inbound_clock)
        gm.is_one_on_one = np.int32(g.is_one_on_one)
        self.reset_now = np.int32(s.reset_now)

    # ----------------------------------------------------------------
    # systems (src/game.cpp), in taskgraph order
    # ----------------------------------------------------------------
    def tick(self):
        for a in self.agents:
            a.reward = F(0)
            if a.reset == 1:
                a.done = F(1)
                a.cur_step = np.int32(0)
            else:
                a.done = F(0)
                a.cur_step = np.int32(a.cur_step + 1)
            a.cooldown = max(F(0), F(a.cooldown - 1.0))

    def action_mask_system(self):
        g = self.game
        for a in self.agents:
            a.mask[:] = [1, 1, 0, 0]
            if a.has_ball == 1:
                a.mask[2] = 1
                a.mask[3] = 1
            if g.inbounding_in_progress == 1:
                a.mask[3] = 0
                a.mask[1] = 0
                if a.im_inbounding == 1 and g.live_ball == 0:
                    a.mask[0] = 0
            if a.cooldown > 0:
                a.mask[1] = 0
            if self.cfg.tag_mode:
                a.mask[2] = 0
                a.mask[1] = 0

    def move_agent_system(self):
        cfg = self.cfg
        for a in self.agents:
            if a.action[2] != 0:
                ang = F(math.pi / 180.0 * 6) if a.action[2] == 1 \
                    else F(-math.pi / 180.0 * 6)
                a.orient = quat_mul(quat_angle_axis(ang, v3(0, 0, 1)),
                                    a.orient)
            if a.mask[0] == 0:
                continue
            move_angle = F(a.action[1]) * F(C.ANGLE_BETWEEN_DIRECTIONS)
            delta_vel = (v3(np.sin(move_angle), -np.cos(move_angle), 0)
                         * a.quickness * F(a.action[0]))
            max_speed = a.max_speed
            ovec = quat_rotate(a.orient, FWD)
            dot = F(0)
            if length2(a.vel) > 1e-6:
                dot = F(np.dot(normalize(a.vel), ovec))
            if dot < -0.1:
                max_speed = F(max_speed * 0.1)
                delta_vel = (delta_vel * F(0.1)).astype(F)
            elif dot <= 0.8:
                max_speed = F(max_speed * 0.7)
                delta_vel = (delta_vel * F(0.1)).astype(F)
            a.vel = (a.vel + delta_vel).astype(F)
            if a.has_ball == 1:
                max_speed = F(max_speed * C.BALL_AGENT_SLOWDOWN)
            if length(a.vel) > max_speed:
                a.vel = (a.vel * (max_speed / length(a.vel))).astype(F)
            new_x = F(np.clip(a.pos[0] + a.vel[0] * self.dt, 0.0,
                              cfg.grid_width))
            new_y = F(np.clip(a.pos[1] + a.vel[1] * self.dt, 0.0,
                              cfg.grid_height))
            a.pos[0] = new_x
            a.pos[1] = new_y
            a.vel = (a.vel * F(0.95)).astype(F)

    def grab_system(self):
        g, b = self.game, self.ball
        for a in self.agents:
            if a.mask[1] == 0 or a.action[3] == 0:
                continue
            a.cooldown = F(10)
            a.action[3] = 0
            if b.in_flight == 1:
                continue
            holding = (a.has_ball == 1 and b.grabbed == 1 and
                       b.holder == a.id)
            if holding:
                a.held_ball_id = PLACEHOLDER
                a.has_ball = np.int32(0)
                b.holder = PLACEHOLDER
                b.grabbed = np.int32(0)
                continue
            if length(b.pos - a.pos) <= 0.3:
                if g.is_one_on_one == 1 and F(a.team) != g.team_in_possession:
                    self.reset_now = np.int32(1)
                    continue
                for other in self.agents:
                    if other.held_ball_id == b.id:
                        other.has_ball = np.int32(0)
                        other.held_ball_id = PLACEHOLDER
                        other.cooldown = F(C.SIMULATION_HZ)
                a.has_ball = np.int32(1)
                a.held_ball_id = b.id
                b.holder = a.id
                b.grabbed = np.int32(1)
                b.in_flight = np.int32(0)
                b.vel = v3()
                b.shot_by_agent = PLACEHOLDER
                b.shot_by_team = PLACEHOLDER
                b.shot_point_value = np.int32(2)
                g.team_in_possession = F(a.team)
                g.live_ball = np.int32(1)

    def pass_system(self):
        g, b = self.game, self.ball
        for a in self.agents:
            if a.mask[2] == 0 or a.action[4] == 0:
                continue
            if b.holder == a.id:
                b.grabbed = np.int32(0)
                b.holder = PLACEHOLDER
                a.has_ball = np.int32(0)
                a.held_ball_id = PLACEHOLDER
                a.im_inbounding = np.int32(0)
                b.vel = quat_rotate(a.orient, v3(0, 0.1, 0))
                g.inbounding_in_progress = np.int32(0)

    def shoot_system(self, shot_u):
        g, b = self.game, self.ball
        for i, a in enumerate(self.agents):
            if a.mask[3] == 0 or a.action[5] == 0:
                continue
            zone_center = v3()
            zone_radius = F(0)
            for h in self.hoops:
                if h.id != a.defending_hoop:
                    zone_center = h.zone_center
                    zone_radius = h.zone_radius
            ideal = (zone_center - a.pos).astype(F)
            intended = F(np.arctan2(ideal[0], ideal[1]))
            dist = length(ideal)
            dev_dist = F(shot_u[i, 0] * F(C.DIST_DEVIATION_PER_METER * dist))
            d_def = np.inf
            for other in self.agents:
                if other.team != a.team:
                    d = length(a.pos - other.pos)
                    if d < d_def:
                        d_def = d
            dev_def = F(0)
            if d_def < 2.0:
                dev_def = F(shot_u[i, 1] *
                            F(C.DEF_DEVIATION_PER_METER / F(d_def + 0.1)))
            dev_vel = F(0)
            if a.action[0] > 0:
                dev_vel = F(shot_u[i, 2] *
                            F(C.VEL_DEVIATION_FACTOR * length(a.vel)))
            shot_dir = F(intended + dev_dist + dev_def + dev_vel)
            final_vec = v3(np.sin(shot_dir), np.cos(shot_dir), 0)
            going_in = F(0)
            t_along = F(np.dot(ideal, final_vec))
            if t_along < 0:
                going_in = F(0)
            else:
                closest_sq = F(length2(ideal) - t_along * t_along)
                going_in = F(1) if closest_sq <= zone_radius * zone_radius \
                    else F(0)
            a.orient = find_rotation_between_vectors(FWD, final_vec)
            if b.holder == a.id:
                spv = np.int32(get_shot_point_value(a.pos, zone_center))
                if going_in == 1:
                    b.shot_going_in = np.int32(1)
                    g.scored_baskets = F(g.scored_baskets + 1)
                else:
                    a.reward = F(a.reward - 1)
                b.grabbed = np.int32(0)
                b.holder = PLACEHOLDER
                a.has_ball = np.int32(0)
                a.held_ball_id = PLACEHOLDER
                a.im_inbounding = np.int32(0)
                b.vel = (final_vec * F(0.1)).astype(F)
                b.in_flight = np.int32(1)
                b.shot_by_agent = a.id
                b.shot_by_team = np.int32(a.team)
                b.shot_point_value = spv
                b.last_touched_agent = a.id
                b.last_touched_team = np.int32(a.team)

    def move_ball_system(self):
        cfg, b = self.cfg, self.ball
        for a in self.agents:
            if a.has_ball == 1 and b.grabbed == 1 and b.holder == a.id:
                b.pos = a.pos.copy()
        if length(b.vel) == 0 or b.grabbed == 1:
            return
        new_x = F(np.clip(b.pos[0] + b.vel[0], 0.0, cfg.grid_width))
        new_y = F(np.clip(b.pos[1] + b.vel[1], 0.0, cfg.grid_height))
        new_z = F(b.pos[2] + b.vel[2])
        b.pos = v3(new_x, new_y, new_z)

    def update_shot_pct(self):
        for a in self.agents:
            if a.has_ball == 0:
                a.shot_pct = F(0)
                continue
            att = self.hoops[0].pos if self.hoops[0].id != a.defending_hoop \
                else self.hoops[1].pos
            dist_hoop = length(att - a.pos)
            d_def = np.inf
            for other in self.agents:
                if other.team != a.team:
                    d = length(a.pos - other.pos)
                    if d < d_def:
                        d_def = d
            dist_sd = F(C.DIST_DEVIATION_PER_METER * dist_hoop)
            def_sd = F(F(C.DEF_DEVIATION_PER_METER) / F(d_def) + F(1e-4))
            vel_sd = F(C.VEL_DEVIATION_FACTOR * length(a.vel))
            final_sd = F(np.sqrt(F(dist_sd * dist_sd / F(3.0)) +
                                 F(def_sd * def_sd / F(3.0)) +
                                 F(vel_sd * vel_sd / F(3.0))))
            with np.errstate(divide="ignore"):
                max_make = F(np.arctan(
                    F(C.HOOP_SCORE_ZONE_SIZE) / dist_hoop))
            z = F(max_make / final_sd)
            a.shot_pct = F(math.erf(z / np.sqrt(F(2.0))))

    def _find_vector_to_center(self, pos):
        cfg = self.cfg
        return normalize(v3(cfg.start_x, cfg.start_y, 0) - pos)

    def _assign_inbounder(self, ball_pos, new_team_idx, new_orientation,
                          is_oob):
        g, b = self.game, self.ball
        assigned = False
        for a in self.agents:
            if a.team == new_team_idx and not assigned:
                assigned = True
                a.im_inbounding = np.int32(1)
                a.pos = np.asarray(ball_pos, F).copy()
                b.grabbed = np.int32(1)
                b.holder = a.id
                a.has_ball = np.int32(1)
                a.held_ball_id = b.id
                a.orient = np.asarray(new_orientation, F).copy()
        if assigned:
            g.team_in_possession = F(new_team_idx)
            g.inbounding_in_progress = np.int32(1)
            g.inbound_clock = F(5)
            if is_oob:
                g.oob_count = F(g.oob_count + 1)

    def score_system(self):
        g, b = self.game, self.ball
        for h in self.hoops:
            dist = F(np.sqrt(F((b.pos[0] - h.pos[0]) * (b.pos[0] - h.pos[0]) +
                               (b.pos[1] - h.pos[1]) * (b.pos[1] - h.pos[1]))))
            if dist <= h.zone_radius and b.in_flight == 1:
                points = b.shot_point_value
                inb_team = np.int32(0)
                for a in self.agents:
                    if a.defending_hoop == h.id:
                        inb_team = np.int32(a.team)
                    if a.id == b.shot_by_agent:
                        delta = -points if a.defending_hoop == h.id else points
                        a.stat_points = F(a.stat_points + F(delta))
                if h.id == g.team0_hoop:
                    g.team1_score = F(g.team1_score + F(points))
                    spot = v3(C.COURT_MIN_X,
                              h.pos[1] + F(C.PIXELS_PER_METER / 60.0), 0)
                else:
                    g.team0_score = F(g.team0_score + F(points))
                    spot = v3(C.COURT_MAX_X,
                              h.pos[1] + F(C.PIXELS_PER_METER / 60.0), 0)
                g.scored_baskets = F(g.scored_baskets + 1)
                b.in_flight = np.int32(0)
                b.vel = v3()
                b.shot_by_agent = PLACEHOLDER
                b.shot_by_team = PLACEHOLDER
                b.shot_point_value = np.int32(2)
                b.shot_going_in = np.int32(0)
                if g.is_one_on_one == 0:
                    b.pos = spot.copy()
                    orient = find_rotation_between_vectors(
                        FWD, self._find_vector_to_center(b.pos))
                    self._assign_inbounder(spot, inb_team, orient, False)
                else:
                    self.reset_now = np.int32(1)

    def out_of_bounds_system(self):
        g, b = self.game, self.ball
        oob = (b.pos[0] < C.COURT_MIN_X or b.pos[0] > C.COURT_MAX_X or
               b.pos[1] < C.COURT_MIN_Y or b.pos[1] > C.COURT_MAX_Y)
        if not (oob and g.inbounding_in_progress == 0):
            return
        if g.is_one_on_one == 1:
            off = self.agents[0]
            for a in self.agents[1:]:
                if F(a.team) == g.team_in_possession:
                    off = a
            off.reward = F(off.reward - 100)
            self.reset_now = np.int32(1)
        else:
            b.in_flight = np.int32(0)
            b.vel = v3()
            g.live_ball = np.int32(0)
            new_team = np.int32(1 - b.last_touched_team)
            for a in self.agents:
                if a.has_ball == 1 and a.held_ball_id == b.id:
                    a.pos = (a.pos + self._find_vector_to_center(a.pos)
                             ).astype(F)
                    a.has_ball = np.int32(0)
                    a.held_ball_id = PLACEHOLDER
            orient = find_rotation_between_vectors(
                FWD, self._find_vector_to_center(b.pos))
            self._assign_inbounder(b.pos, new_team, orient, True)

    def update_last_touch(self):
        b = self.ball
        for a in self.agents:
            if length(b.pos - a.pos) <= C.AGENT_SIZE_M:
                b.last_touched_agent = a.id
                b.last_touched_team = np.int32(a.team)

    def clock_system(self):
        g = self.game
        if g.live_ball > 0.5 and g.game_clock > 0:
            g.game_clock = F(g.game_clock - self.dt)
            g.shot_clock = F(g.shot_clock - self.dt)
        if g.inbounding_in_progress > 0.5:
            g.inbound_clock = F(g.inbound_clock - self.dt)
        if g.game_clock <= 0 and g.live_ball > 0.5:
            off = self.agents[0]
            for a in self.agents[1:]:
                if F(a.team) == g.team_in_possession:
                    off = a
            off.reward = F(off.reward + 10)
            self.reset_now = np.int32(1)
        if g.shot_clock < 0:
            g.shot_clock = F(0)

    def inbound_violation_system(self):
        g, b = self.game, self.ball
        if not (g.inbounding_in_progress > 0.5 and g.inbound_clock <= 0):
            return
        new_team = np.int32(1 - np.int32(g.team_in_possession))
        ball_to_turnover = PLACEHOLDER
        g.live_ball = np.int32(0)
        for a in self.agents:
            if a.im_inbounding > 0.5:
                ball_to_turnover = a.held_ball_id
                a.im_inbounding = np.int32(0)
                a.has_ball = np.int32(0)
                a.held_ball_id = PLACEHOLDER
                a.pos = (a.pos + self._find_vector_to_center(a.pos)).astype(F)
        if ball_to_turnover != PLACEHOLDER and ball_to_turnover == b.id:
            b.grabbed = np.int32(0)
            b.holder = PLACEHOLDER
            orient = find_rotation_between_vectors(
                FWD, self._find_vector_to_center(b.pos))
            self._assign_inbounder(b.pos, new_team, orient, True)

    # ------------------------ reset (src/gen.cpp:216-316) ----------------
    def _setup_agent_positions(self, reset_u):
        cfg, g = self.cfg, self.game
        ball_spawn = v3(cfg.start_x, cfg.start_y, 0)
        for i, a in enumerate(self.agents):
            if g.is_one_on_one == 1:
                if i == 0:
                    base = v3(cfg.start_x + i * 2.0, cfg.start_y, 0)
                    x_dev = F(reset_u[0] * F(C.START_POS_STDDEV))
                    y_dev = F(reset_u[1] * F(C.START_POS_STDDEV))
                    a.pos = (base + v3(x_dev, y_dev, 0)).astype(F)
                    a.pos[0] = F(np.clip(a.pos[0], 0, cfg.grid_width))
                    a.pos[1] = F(np.clip(a.pos[1], 0, cfg.grid_height))
                    ball_spawn = a.pos.copy()
                    a.has_ball = np.int32(1)
                    a.held_ball_id = self.ball.id
                    a.points_worth = np.int32(2)
                else:
                    angle = F(reset_u[2] * F(2 * math.pi))
                    offset = v3(C.DEFENDER_SPAWN_RADIUS * np.cos(angle),
                                C.DEFENDER_SPAWN_RADIUS * np.sin(angle), 0)
                    a.pos = (ball_spawn + offset).astype(F)
                    a.pos[0] = F(np.clip(a.pos[0], 0, cfg.grid_width))
                    a.pos[1] = F(np.clip(a.pos[1], 0, cfg.grid_height))
                    a.has_ball = np.int32(0)
                    a.held_ball_id = PLACEHOLDER
                    a.points_worth = np.int32(2)
            else:
                a.pos = v3(cfg.start_x - 1 + 2 * (i % 2),
                           cfg.start_y - 2 + i // 2, 0)
                a.has_ball = np.int32(1 if i == 0 else 0)
                a.held_ball_id = self.ball.id if i == 0 else PLACEHOLDER
                a.points_worth = np.int32(2)
            a.max_speed = F(C.DEFAULT_SPEED - i * C.DEFENDER_SLOWDOWN)
            a.quickness = F(1)
            a.shooting = F(0)
            a.ft_pct = F(0)
            a.reaction = F(i * C.DEFENDER_REACTION)
            a.target_pos = a.pos.copy()
            a.shot_pct = F(0)
        return ball_spawn

    def reset_world(self, reset_u):
        g, b = self.game, self.ball
        if g.game_clock <= 0 and g.is_one_on_one == 0:
            if g.period < 4 or g.team0_score == g.team1_score:
                g.period = F(g.period + 1)
                g.game_clock = F(self.cfg.time_per_period)
                g.shot_clock = F(self.cfg.shot_clock_duration)
                g.live_ball = np.int32(1)
                g.inbounding_in_progress = np.int32(0)
            else:
                g.live_ball = np.int32(0)
        else:
            g.inbounding_in_progress = np.int32(0)
            g.live_ball = np.int32(1)
            g.period = F(1)
            g.team_in_possession = F(0)
            g.team0_score = F(0)
            g.team1_score = F(0)
            g.game_clock = F(self.cfg.time_per_period)
            g.shot_clock = F(self.cfg.shot_clock_duration)
            g.scored_baskets = F(0)
            g.oob_count = F(0)
            g.inbound_clock = F(0)

        for i, a in enumerate(self.agents):
            a.action[:] = 0
            a.mask[:] = 0
            a.reset = np.int32(0)
            a.im_inbounding = np.int32(0)
            a.done = F(1)
            a.cur_step = np.int32(0)
            sign = -1.0 if i % 2 == 0 else 1.0
            a.orient = quat_angle_axis(F(sign * math.pi / 2), v3(0, 0, 1))
            a.cooldown = F(0)
            a.stat_points = F(0)
            a.stat_fouls = F(0)
            a.vel = v3()
            a.team = np.int32(i % 2)
            a.team_color = np.asarray(C.RESET_TEAM_COLORS[i % 2], F)
            a.defending_hoop = g.team0_hoop if i % 2 == 0 else g.team1_hoop

        ball_spawn = self._setup_agent_positions(reset_u)
        b.pos = ball_spawn.copy()
        b.in_flight = np.int32(0)
        b.last_touched_agent = PLACEHOLDER
        b.last_touched_team = PLACEHOLDER
        b.shot_by_agent = PLACEHOLDER
        b.shot_by_team = PLACEHOLDER
        b.shot_point_value = np.int32(2)
        b.shot_going_in = np.int32(0)
        b.vel = v3()
        if g.is_one_on_one == 1:
            b.grabbed = np.int32(1)
            b.holder = np.int32(C.AGENT_IDS[0])
        else:
            b.grabbed = np.int32(0)
            b.holder = PLACEHOLDER

    def reset_system(self, reset_u):
        if self.reset_now == 0:
            return
        self.reset_world(reset_u)
        self.reset_now = np.int32(0)

    def update_points_worth(self):
        for a in self.agents:
            target = None
            for h in self.hoops:
                if h.id != a.defending_hoop:
                    target = h.zone_center
                    break
            if target is not None:
                a.points_worth = np.int32(get_shot_point_value(a.pos, target))
            else:
                a.points_worth = np.int32(2)

    def agent_collision_system(self):
        g = self.game
        a0, a1 = self.agents[0], self.agents[1]

        def rect(agent):
            fwd = quat_rotate(agent.orient, FWD)
            right = v3(fwd[1], -fwd[0], 0)
            hw = (right * F(C.AGENT_SHOULDER_WIDTH / 2.0)).astype(F)
            hd = (fwd * F(C.AGENT_DEPTH / 2.0)).astype(F)
            c = agent.pos
            verts = np.stack([c - hd + hw, c - hd - hw,
                              c + hd - hw, c + hd + hw]).astype(F)
            return verts, fwd, right

        va, fa, ra = rect(a0)
        vb, fb, rb = rect(a1)
        axes = [normalize(ra), normalize(fa), normalize(rb), normalize(fb)]
        colliding = True
        min_overlap = F(np.finfo(np.float32).max)
        mtv = v3()
        for axis in axes:
            pa = va @ axis
            pb = vb @ axis
            pa_min, pa_max = F(pa.min()), F(pa.max())
            pb_min, pb_max = F(pb.min()), F(pb.max())
            if not (pa_max > pb_min and pb_max > pa_min):
                colliding = False
                break
            overlap = F(min(pa_max, pb_max) - max(pa_min, pb_min))
            if overlap < min_overlap:
                min_overlap = overlap
                mtv = axis
        if colliding:
            if self.cfg.tag_mode:
                if g.team_in_possession == F(a0.team):
                    a0.reward = F(a0.reward - 10)
                    a1.reward = F(a1.reward + 10)
                    self.reset_now = np.int32(1)
            c2c = (a1.pos - a0.pos).astype(F)
            if np.dot(c2c, mtv) < 0:
                mtv = (-mtv).astype(F)
            corr = (mtv * min_overlap * F(0.5)).astype(F)
            a0.pos = (a0.pos - corr).astype(F)
            a1.pos = (a1.pos + corr).astype(F)

    def hard_code_defense(self):
        g = self.game
        for a in self.agents:
            if g.team_in_possession == F(a.team):
                a.action[0] = 0
                continue
            a.action[3] = 1
            guard = None
            found = False
            for other in self.agents:
                if other.has_ball == 1 and not found:
                    for h in self.hoops:
                        if a.defending_hoop == h.id:
                            hoop_dir = (h.pos - other.pos).astype(F)
                            if length2(hoop_dir) > 1e-6:
                                guard = (other.pos + F(C.GUARDING_DISTANCE) *
                                         normalize(hoop_dir)).astype(F)
                            else:
                                guard = other.pos.copy()
                            found = True
            if not found:
                a.action[0] = 0
                continue
            interp = F(a.reaction * self.dt)
            a.target_pos = (a.target_pos +
                            (guard - a.target_pos) * interp).astype(F)
            mv = (a.target_pos - a.pos).astype(F)
            if length2(mv) < 0.01:
                a.action[0] = 0
                continue
            desired = normalize(mv)
            max_dot = F(-2)
            best = 0
            dirs = [v3(0, -1, 0), v3(1, -1, 0), v3(1, 0, 0), v3(1, 1, 0),
                    v3(0, 1, 0), v3(-1, 1, 0), v3(-1, 0, 0), v3(-1, -1, 0)]
            for k, d in enumerate(dirs):
                cur = F(np.dot(desired, normalize(d)))
                if cur > max_dot:
                    max_dot = cur
                    best = k
            a.action[0] = 1
            a.action[1] = best
            ovec = quat_rotate(a.orient, FWD)
            ang = F(np.arccos(np.clip(F(np.dot(ovec, desired)), -1.0, 1.0)))
            if ang > math.pi / 8:
                cross_z = F(ovec[0] * mv[1] - ovec[1] * mv[0])
                if cross_z < 0:
                    a.action[2] = -1
                elif cross_z > 0:
                    a.action[2] = 1
                else:
                    a.action[2] = 0
            else:
                a.action[2] = 0

    def fill_observations(self):
        g, b = self.game, self.ball
        inbounder_id = np.int32(-1)
        for a in self.agents:
            if a.im_inbounding > 0.5:
                inbounder_id = a.id

        for a in self.agents:
            obs = np.zeros(128, F)
            idx = 0

            def put(val):
                nonlocal idx
                obs[idx] = F(val)
                idx += 1

            def put3(vec):
                for k in range(3):
                    put(vec[k])

            att = self.hoops[0].pos if self.hoops[0].id != a.defending_hoop \
                else self.hoops[1].pos
            dfd = self.hoops[0].pos if self.hoops[0].id == a.defending_hoop \
                else self.hoops[1].pos

            put(g.game_clock)
            put(g.shot_clock)
            put(g.period)
            put(g.inbounding_in_progress)
            put(g.inbound_clock)
            if a.team == 0:
                put(g.team0_score)
                put(g.team1_score)
            else:
                put(g.team1_score)
                put(g.team0_score)
            put3(b.pos)
            put3(b.vel)
            put(b.grabbed)
            put(b.in_flight)
            put(b.shot_point_value)
            put(b.last_touched_team)
            put3(att)
            put3(dfd)

            def block(agent, hoop_pos, self_block):
                put3(agent.pos)
                if self_block:
                    put3(v3())
                    put(0)
                else:
                    rel = (agent.pos - a.pos).astype(F)
                    if length2(rel) > 1e-6:
                        put3(normalize(rel))
                    else:
                        put3(v3())
                    put(length(rel))
                for k in range(4):
                    put(agent.orient[k])
                ovec = quat_rotate(agent.orient, FWD)
                put3(ovec)
                if length2(agent.vel) > 1e-6:
                    put3(normalize(agent.vel))
                    dot = F(np.dot(normalize(agent.vel), ovec))
                else:
                    put3(v3())
                    dot = F(0)
                put(length(agent.vel))
                put(dot)
                put(0.1 if dot <= 0.8 else 1.0)
                dh = (hoop_pos - agent.pos).astype(F)
                if length(dh) > 1e-6:
                    put3(normalize(dh))
                else:
                    put3(v3())
                put(length(dh))
                db = (b.pos - agent.pos).astype(F)
                if length(db) > 1e-6:
                    put3(normalize(db))
                else:
                    put3(v3())
                put(length(db))
                put(agent.im_inbounding)
                put(agent.cooldown)
                put(agent.max_speed)
                put(agent.quickness)
                put(agent.shooting)
                put(agent.ft_pct)
                put(agent.reaction)
                put(agent.shot_pct)
                put(agent.points_worth)
                put(agent.has_ball)

            block(a, att, True)
            for other in self.agents:
                if other.id == a.id:
                    continue
                # For N=2 the other agent is always an opponent; opponents'
                # dir-to-hoop uses my defending hoop (src/game.cpp:1395).
                block(other, dfd, False)
            for other in self.agents:
                put(1.0 if other.id == b.holder else 0.0)
            for other in self.agents:
                put(1.0 if other.id == inbounder_id else 0.0)
            a.obs = obs

    def reward_system(self):
        g, b = self.game, self.ball
        for i, a in enumerate(self.agents):
            other = self.agents[1 - i]
            dist_other = length(other.pos - a.pos)
            if F(a.team) == g.team_in_possession:
                if g.game_clock > 5:
                    if b.shot_by_agent == a.id and b.shot_going_in == 1:
                        a.reward = F(a.reward + F(b.shot_point_value))
                    elif (b.shot_by_agent == a.id and b.shot_going_in == 0
                          and b.in_flight == 1):
                        a.reward = F(a.reward - 1)
                    a.reward = F(a.reward + a.shot_pct)
            else:
                a.reward = F(a.reward - 1)
                a.reward = F(a.reward + F(np.exp(F(-0.4) * dist_other)))

    # ----------------------------------------------------------------
    def step(self, shot_u, reset_u):
        self.tick()
        self.action_mask_system()
        self.move_agent_system()
        self.grab_system()
        self.pass_system()
        self.shoot_system(np.asarray(shot_u, F))
        self.move_ball_system()
        self.update_shot_pct()
        self.score_system()
        self.out_of_bounds_system()
        self.update_last_touch()
        self.clock_system()
        self.inbound_violation_system()
        self.reset_system(np.asarray(reset_u, F))
        self.update_points_worth()
        self.agent_collision_system()
        self.hard_code_defense()
        self.fill_observations()
        self.reward_system()
