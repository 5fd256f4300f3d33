"""Flat SoA field-row layout for the fused step kernel.

The structured `State` pytree is the framework's API, but its small trailing
dimensions ((W, 2, 3) positions, (W, 2, 4) quats, ...) tile terribly on TPU:
the last two dims are padded to (8, 128) vregs, inflating HBM traffic by up
to ~40x.  The fused step instead stores ALL scalar state components as rows
of two matrices

    SF: (N_F32_ROWS, W) float32      SI: (N_I32_ROWS, W) int32

so every field is a lane-contiguous (W,) vector and the whole 19-system
chain becomes straight-line VPU code inside one Pallas kernel
(ops/pallas_step.py).  `pack`/`unpack` convert to/from `State` at the API
boundary (init, export, checkpoint); the hot loop never leaves matrix form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .. import constants as C
from ..config import SimConfig
from ..state import State

F32 = jnp.float32
I32 = jnp.int32

AGENT_F32 = (
    "pos_x", "pos_y", "pos_z",
    "vel_x", "vel_y", "vel_z",
    "quat_w", "quat_x", "quat_y", "quat_z",
    "reward", "done", "cooldown",
    "stat_points", "stat_fouls",
    "max_speed", "quickness", "shooting", "ft_pct", "reaction",
    "target_x", "target_y", "target_z",
    "shot_pct",
    "color_r", "color_g", "color_b",
)
AGENT_I32 = (
    "a_move", "a_angle", "a_rotate", "a_grab", "a_pass", "a_shoot",
    "m_move", "m_grab", "m_pass", "m_shoot",
    "reset", "cur_step",
    "has_ball", "held_ball", "points_worth",
    "im_inb", "allowed_move",
    "team", "defend_hoop",
)
BALL_F32 = ("bpos_x", "bpos_y", "bpos_z", "bvel_x", "bvel_y", "bvel_z",
            "bdone")
BALL_I32 = ("bgrabbed", "bholder", "binflight", "blt_agent", "blt_team",
            "bsb_agent", "bsb_team", "bspv", "bsgi", "breset", "bcur_step")
GAME_F32 = ("period", "tip", "t0score", "t1score", "gclock", "sclock",
            "sbaskets", "oob", "iclock")
GAME_I32 = ("ginb", "glive", "t0hoop", "t1hoop", "is1v1", "reset_now")
HOOP_F32 = ("hdone0", "hdone1")
HOOP_I32 = ("hcur0", "hcur1", "hreset0", "hreset1")

A = C.NUM_AGENTS

# Row index maps.
F_IDX: dict[str, int] = {}
I_IDX: dict[str, int] = {}
for _i in range(A):
    for _n in AGENT_F32:
        F_IDX[f"a{_i}.{_n}"] = len(F_IDX)
    for _n in AGENT_I32:
        I_IDX[f"a{_i}.{_n}"] = len(I_IDX)
for _n in BALL_F32:
    F_IDX[_n] = len(F_IDX)
for _n in BALL_I32:
    I_IDX[_n] = len(I_IDX)
for _n in GAME_F32:
    F_IDX[_n] = len(F_IDX)
for _n in GAME_I32:
    I_IDX[_n] = len(I_IDX)
for _n in HOOP_F32:
    F_IDX[_n] = len(F_IDX)
for _n in HOOP_I32:
    I_IDX[_n] = len(I_IDX)

N_F32_ROWS = len(F_IDX)  # 72
N_I32_ROWS = len(I_IDX)  # 59
N_OBS_ROWS = A * C.OBS_SIZE  # 256
N_NOISE_ROWS = A * 3 + 3     # 9: shot_u per agent + reset_u


@jax.jit
def pack(state: State):
    """Batched State (leading world axis) -> (SF, SI).

    Jitted: the ~500 per-row slice/astype ops would otherwise dispatch
    eagerly — through the axon tunnel that is tens of seconds of remote
    round-trips per fresh process (bench_logs/r5 compile stage)."""
    a, b, g, h = state.agents, state.ball, state.game, state.hoops
    W = a.pos.shape[0]
    sf = [None] * N_F32_ROWS
    si = [None] * N_I32_ROWS

    def put_f(k, v):
        sf[F_IDX[k]] = v.astype(F32)

    def put_i(k, v):
        si[I_IDX[k]] = v.astype(I32)

    for i in range(A):
        p = f"a{i}."
        put_f(p + "pos_x", a.pos[:, i, 0])
        put_f(p + "pos_y", a.pos[:, i, 1])
        put_f(p + "pos_z", a.pos[:, i, 2])
        put_f(p + "vel_x", a.vel[:, i, 0])
        put_f(p + "vel_y", a.vel[:, i, 1])
        put_f(p + "vel_z", a.vel[:, i, 2])
        for j, qn in enumerate(("quat_w", "quat_x", "quat_y", "quat_z")):
            put_f(p + qn, a.orient[:, i, j])
        put_f(p + "reward", a.reward[:, i])
        put_f(p + "done", a.done[:, i])
        put_f(p + "cooldown", a.grab_cooldown[:, i])
        put_f(p + "stat_points", a.stat_points[:, i])
        put_f(p + "stat_fouls", a.stat_fouls[:, i])
        put_f(p + "max_speed", a.max_speed[:, i])
        put_f(p + "quickness", a.quickness[:, i])
        put_f(p + "shooting", a.shooting[:, i])
        put_f(p + "ft_pct", a.ft_pct[:, i])
        put_f(p + "reaction", a.reaction_speed[:, i])
        put_f(p + "target_x", a.target_pos[:, i, 0])
        put_f(p + "target_y", a.target_pos[:, i, 1])
        put_f(p + "target_z", a.target_pos[:, i, 2])
        put_f(p + "shot_pct", a.shot_pct[:, i])
        put_f(p + "color_r", a.team_color[:, i, 0])
        put_f(p + "color_g", a.team_color[:, i, 1])
        put_f(p + "color_b", a.team_color[:, i, 2])
        for j, an in enumerate(("a_move", "a_angle", "a_rotate", "a_grab",
                                "a_pass", "a_shoot")):
            put_i(p + an, a.action[:, i, j])
        for j, mn in enumerate(("m_move", "m_grab", "m_pass", "m_shoot")):
            put_i(p + mn, a.action_mask[:, i, j])
        put_i(p + "reset", a.reset[:, i])
        put_i(p + "cur_step", a.cur_step[:, i])
        put_i(p + "has_ball", a.has_ball[:, i])
        put_i(p + "held_ball", a.held_ball_id[:, i])
        put_i(p + "points_worth", a.points_worth[:, i])
        put_i(p + "im_inb", a.im_inbounding[:, i])
        put_i(p + "allowed_move", a.allowed_to_move[:, i])
        put_i(p + "team", a.team[:, i])
        put_i(p + "defend_hoop", a.defending_hoop[:, i])

    for j, n in enumerate(("bpos_x", "bpos_y", "bpos_z")):
        put_f(n, b.pos[:, j])
    for j, n in enumerate(("bvel_x", "bvel_y", "bvel_z")):
        put_f(n, b.vel[:, j])
    put_f("bdone", b.done)
    put_i("bgrabbed", b.grabbed)
    put_i("bholder", b.holder)
    put_i("binflight", b.in_flight)
    put_i("blt_agent", b.last_touched_agent)
    put_i("blt_team", b.last_touched_team)
    put_i("bsb_agent", b.shot_by_agent)
    put_i("bsb_team", b.shot_by_team)
    put_i("bspv", b.shot_point_value)
    put_i("bsgi", b.shot_going_in)
    put_i("breset", b.reset)
    put_i("bcur_step", b.cur_step)

    put_f("period", g.period)
    put_f("tip", g.team_in_possession)
    put_f("t0score", g.team0_score)
    put_f("t1score", g.team1_score)
    put_f("gclock", g.game_clock)
    put_f("sclock", g.shot_clock)
    put_f("sbaskets", g.scored_baskets)
    put_f("oob", g.oob_count)
    put_f("iclock", g.inbound_clock)
    put_i("ginb", g.inbounding_in_progress)
    put_i("glive", g.live_ball)
    put_i("t0hoop", g.team0_hoop)
    put_i("t1hoop", g.team1_hoop)
    put_i("is1v1", g.is_one_on_one)
    put_i("reset_now", state.reset_now)

    put_f("hdone0", h.done[:, 0])
    put_f("hdone1", h.done[:, 1])
    put_i("hcur0", h.cur_step[:, 0])
    put_i("hcur1", h.cur_step[:, 1])
    put_i("hreset0", h.reset[:, 0])
    put_i("hreset1", h.reset[:, 1])

    assert all(v is not None for v in sf)
    assert all(v is not None for v in si)
    return jnp.stack(sf), jnp.stack(si)


@functools.partial(jax.jit, static_argnums=0)
def unpack(cfg: SimConfig, sf: jax.Array, si: jax.Array, key: jax.Array,
           obs: jax.Array | None = None) -> State:
    """(SF, SI[, OBS]) -> batched State.  Hoop geometry is reconstructed
    from the config (constant after init).  Jitted like `pack` (eager
    per-row dispatch is prohibitively slow through the axon tunnel)."""
    from ..state import zero_state

    W = sf.shape[1]
    base = jax.vmap(lambda k: zero_state(cfg, k))(
        key if key.ndim == 2 else jax.random.split(key, W))

    def gf(k):
        return sf[F_IDX[k]]

    def gi(k):
        return si[I_IDX[k]]

    def stack_agents(names, dtype=F32, table=None):
        table = gf if table is None else table
        return jnp.stack([table(f"a{i}.{names}") for i in range(A)], axis=1)

    def vec3_agents(prefix, table=gf):
        return jnp.stack([
            jnp.stack([table(f"a{i}.{prefix}_x"), table(f"a{i}.{prefix}_y"),
                       table(f"a{i}.{prefix}_z")], axis=-1)
            for i in range(A)], axis=1)

    agents = base.agents.replace(
        pos=vec3_agents("pos"),
        vel=vec3_agents("vel"),
        orient=jnp.stack([
            jnp.stack([gf(f"a{i}.quat_w"), gf(f"a{i}.quat_x"),
                       gf(f"a{i}.quat_y"), gf(f"a{i}.quat_z")], axis=-1)
            for i in range(A)], axis=1),
        action=jnp.stack([
            jnp.stack([gi(f"a{i}.{n}") for n in
                       ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
                        "a_shoot")], axis=-1) for i in range(A)], axis=1),
        action_mask=jnp.stack([
            jnp.stack([gi(f"a{i}.{n}") for n in
                       ("m_move", "m_grab", "m_pass", "m_shoot")], axis=-1)
            for i in range(A)], axis=1),
        reset=stack_agents("reset", table=gi),
        reward=stack_agents("reward"),
        done=stack_agents("done"),
        cur_step=stack_agents("cur_step", table=gi),
        has_ball=stack_agents("has_ball", table=gi),
        held_ball_id=stack_agents("held_ball", table=gi),
        points_worth=stack_agents("points_worth", table=gi),
        im_inbounding=stack_agents("im_inb", table=gi),
        allowed_to_move=stack_agents("allowed_move", table=gi),
        team=stack_agents("team", table=gi),
        team_color=jnp.stack([
            jnp.stack([gf(f"a{i}.color_r"), gf(f"a{i}.color_g"),
                       gf(f"a{i}.color_b")], axis=-1) for i in range(A)],
            axis=1),
        defending_hoop=stack_agents("defend_hoop", table=gi),
        grab_cooldown=stack_agents("cooldown"),
        stat_points=stack_agents("stat_points"),
        stat_fouls=stack_agents("stat_fouls"),
        max_speed=stack_agents("max_speed"),
        quickness=stack_agents("quickness"),
        shooting=stack_agents("shooting"),
        ft_pct=stack_agents("ft_pct"),
        reaction_speed=stack_agents("reaction"),
        target_pos=vec3_agents("target"),
        shot_pct=stack_agents("shot_pct"),
    )
    if obs is not None:
        agents = agents.replace(
            obs=obs.reshape(A, C.OBS_SIZE, W).transpose(2, 0, 1))

    ball = base.ball.replace(
        pos=jnp.stack([gf("bpos_x"), gf("bpos_y"), gf("bpos_z")], axis=-1),
        vel=jnp.stack([gf("bvel_x"), gf("bvel_y"), gf("bvel_z")], axis=-1),
        done=gf("bdone"),
        grabbed=gi("bgrabbed"),
        holder=gi("bholder"),
        in_flight=gi("binflight"),
        last_touched_agent=gi("blt_agent"),
        last_touched_team=gi("blt_team"),
        shot_by_agent=gi("bsb_agent"),
        shot_by_team=gi("bsb_team"),
        shot_point_value=gi("bspv"),
        shot_going_in=gi("bsgi"),
        reset=gi("breset"),
        cur_step=gi("bcur_step"),
    )
    game = base.game.replace(
        period=gf("period"), team_in_possession=gf("tip"),
        team0_score=gf("t0score"), team1_score=gf("t1score"),
        game_clock=gf("gclock"), shot_clock=gf("sclock"),
        scored_baskets=gf("sbaskets"), oob_count=gf("oob"),
        inbound_clock=gf("iclock"),
        inbounding_in_progress=gi("ginb"), live_ball=gi("glive"),
        team0_hoop=gi("t0hoop"), team1_hoop=gi("t1hoop"),
        is_one_on_one=gi("is1v1"),
    )
    # Hoop geometry is deterministic from cfg (src/gen.cpp:96-156).
    court_start_x = (cfg.grid_width - C.COURT_LENGTH_M) / 2.0
    cy = cfg.grid_height / 2.0
    hoop_pos = jnp.broadcast_to(jnp.array(
        [[court_start_x + C.HOOP_FROM_BASELINE_M, cy, 0.0],
         [court_start_x + C.COURT_LENGTH_M - C.HOOP_FROM_BASELINE_M, cy,
          0.0]], F32), (W, 2, 3))
    hoops = base.hoops.replace(
        pos=hoop_pos, zone_center=hoop_pos,
        done=jnp.stack([gf("hdone0"), gf("hdone1")], axis=-1),
        cur_step=jnp.stack([gi("hcur0"), gi("hcur1")], axis=-1),
        reset=jnp.stack([gi("hreset0"), gi("hreset1")], axis=-1),
    )
    return State(agents=agents, ball=ball, hoops=hoops, game=game,
                 reset_now=gi("reset_now"), key=key)
