"""World generation, episode reset, and the composed simulation step.

Pure-functional replacements for the reference's `generateWorld`/`resetWorld`
(src/gen.cpp:13-214, 216-316) and the taskgraph execution of the 18-system
chain (src/game.cpp:1463-1526, src/mgr.cpp:243-246).

A single world's step is `step(cfg, state) -> state`; the batched multi-world
executor of the reference (TaskGraphExecutor / MWCudaExecutor megakernel,
src/mgr.cpp:49-128) becomes `jax.jit(jax.vmap(step))` over a leading world
axis — XLA fuses the whole chain into a handful of kernels vectorized over
worlds, which is the TPU-native equivalent of the CUDA megakernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import constants as C
from . import systems as S
from .config import SimConfig
from .maths import quat_angle_axis
from .state import State, tree_select, zero_state

F32 = jnp.float32
I32 = jnp.int32
PLACEHOLDER = C.ENTITY_ID_PLACEHOLDER


# =====================================================================
# Spawn helper (src/helper.cpp:108-160)
# =====================================================================

def _setup_agent_positions(cfg: SimConfig, s: State,
                           reset_u: jax.Array) -> tuple[State, jax.Array]:
    """Position agents, set possession + attributes; returns the ball spawn.

    1v1: offense at start + U(-5,5)^2, defender on a radius-8 circle at a
    uniform angle; 5v5 grid spawn fallback (src/helper.cpp:112-159).
    The branch between the two is on the *runtime* GameState.isOneOnOne,
    exactly like the reference.
    """
    a = s.agents
    one = s.game.is_one_on_one == 1

    # --- 1v1 positions ---
    x_dev = reset_u[0] * C.START_POS_STDDEV
    y_dev = reset_u[1] * C.START_POS_STDDEV
    p0_one = jnp.stack([
        jnp.clip(cfg.start_x + x_dev, 0.0, cfg.grid_width),
        jnp.clip(cfg.start_y + y_dev, 0.0, cfg.grid_height),
        jnp.zeros((), F32),
    ])
    angle = reset_u[2] * (2.0 * jnp.pi)
    p1_one = jnp.stack([
        jnp.clip(p0_one[0] + C.DEFENDER_SPAWN_RADIUS * jnp.cos(angle),
                 0.0, cfg.grid_width),
        jnp.clip(p0_one[1] + C.DEFENDER_SPAWN_RADIUS * jnp.sin(angle),
                 0.0, cfg.grid_height),
        jnp.zeros((), F32),
    ])

    new_pos, new_has, new_held = [], [], []
    for i in range(cfg.num_agents):
        # --- 5v5 grid spawn (src/helper.cpp:148) ---
        p_grid = jnp.array([cfg.start_x - 1.0 + 2.0 * (i % 2),
                            cfg.start_y - 2.0 + i // 2, 0.0], F32)
        p_one = p0_one if i == 0 else p1_one
        new_pos.append(jnp.where(one, p_one, p_grid))
        new_has.append(jnp.where(i == 0, 1, 0).astype(I32))
        new_held.append(jnp.array(C.BALL_ID if i == 0 else PLACEHOLDER, I32))

    pos = jnp.stack(new_pos)
    a = a.replace(
        pos=pos,
        has_ball=jnp.stack(new_has),
        held_ball_id=jnp.stack(new_held),
        points_worth=jnp.full((cfg.num_agents,), 2, I32),
        max_speed=jnp.array([C.DEFAULT_SPEED - i * C.DEFENDER_SLOWDOWN
                             for i in range(cfg.num_agents)], F32),
        quickness=jnp.ones((cfg.num_agents,), F32),
        shooting=jnp.zeros((cfg.num_agents,), F32),
        ft_pct=jnp.zeros((cfg.num_agents,), F32),
        reaction_speed=jnp.array([i * C.DEFENDER_REACTION
                                  for i in range(cfg.num_agents)], F32),
        target_pos=pos,
        shot_pct=jnp.zeros((cfg.num_agents,), F32),
    )
    ball_spawn = jnp.where(one, pos[0],
                           jnp.array([cfg.start_x, cfg.start_y, 0.0], F32))
    return s.replace(agents=a), ball_spawn


def _reset_agent_common(cfg: SimConfig, s: State, done_val: float,
                        colors) -> State:
    """Component resets shared by generateWorld and resetWorld
    (src/gen.cpp:186-206, 267-284)."""
    A = cfg.num_agents
    a = s.agents
    orients = jnp.stack([
        quat_angle_axis(jnp.array((-1.0 if i % 2 == 0 else 1.0) * jnp.pi / 2,
                                  F32),
                        jnp.array([0.0, 0.0, 1.0], F32))
        for i in range(A)])
    a = a.replace(
        action=jnp.zeros((A, 6), I32),
        action_mask=jnp.zeros((A, 4), I32),
        reset=jnp.zeros((A,), I32),
        im_inbounding=jnp.zeros((A,), I32),
        allowed_to_move=jnp.ones((A,), I32),
        done=jnp.full((A,), done_val, F32),
        cur_step=jnp.zeros((A,), I32),
        orient=orients,
        grab_cooldown=jnp.zeros((A,), F32),
        stat_points=jnp.zeros((A,), F32),
        stat_fouls=jnp.zeros((A,), F32),
        vel=jnp.zeros((A, 3), F32),
        team=jnp.arange(A, dtype=I32) % 2,
        team_color=jnp.array([colors[i % 2] for i in range(A)], F32),
        defending_hoop=jnp.where(jnp.arange(A, dtype=I32) % 2 == 0,
                                 s.game.team0_hoop, s.game.team1_hoop),
    )
    return s.replace(agents=a)


def _reset_ball(cfg: SimConfig, s: State, ball_pos: jax.Array,
                done_val: float) -> State:
    b = s.ball.replace(
        pos=ball_pos,
        reset=jnp.zeros((), I32),
        done=jnp.array(done_val, F32),
        cur_step=jnp.zeros((), I32),
        in_flight=jnp.zeros((), I32),
        last_touched_agent=jnp.array(PLACEHOLDER, I32),
        last_touched_team=jnp.array(PLACEHOLDER, I32),
        shot_by_agent=jnp.array(PLACEHOLDER, I32),
        shot_by_team=jnp.array(PLACEHOLDER, I32),
        shot_point_value=jnp.array(2, I32),
        shot_going_in=jnp.zeros((), I32),
        vel=jnp.zeros(3, F32),
    )
    one = s.game.is_one_on_one == 1
    b = b.replace(
        grabbed=jnp.where(one, 1, 0).astype(I32),
        holder=jnp.where(one, C.AGENT_IDS[0], PLACEHOLDER).astype(I32),
    )
    return s.replace(ball=b)


# =====================================================================
# generateWorld (src/gen.cpp:13-214)
# =====================================================================

def generate_world(cfg: SimConfig, key: jax.Array) -> State:
    s = zero_state(cfg, key)

    # Hoops at baseline +- HOOP_FROM_BASELINE, centered on the *grid*
    # (32 x 17), not the world rect (src/gen.cpp:96-156) -> (3.25, 8.5) and
    # (28.75, 8.5).
    court_start_x = (cfg.grid_width - C.COURT_LENGTH_M) / 2.0
    court_center_y = cfg.grid_height / 2.0
    hoop_pos = jnp.array([
        [court_start_x + C.HOOP_FROM_BASELINE_M, court_center_y, 0.0],
        [court_start_x + C.COURT_LENGTH_M - C.HOOP_FROM_BASELINE_M,
         court_center_y, 0.0],
    ], F32)
    s = s.replace(hoops=s.hoops.replace(pos=hoop_pos, zone_center=hoop_pos))

    key, nk = jax.random.split(key)
    noise = S.draw_noise(cfg, nk)
    s = s.replace(key=key)

    s = _reset_agent_common(cfg, s, done_val=0.0,
                            colors=(C.TEAM0_COLOR, C.TEAM1_COLOR))
    s, _ball_spawn = _setup_agent_positions(cfg, s, noise.reset_u)
    # generateWorld leaves the ball at the grid start point even though the
    # offense holds it (src/gen.cpp:169 vs resetWorld's src/gen.cpp:292) —
    # it teleports to the holder on the first moveBallSystem tick.
    s = _reset_ball(cfg, s,
                    jnp.array([cfg.start_x, cfg.start_y, 0.0], F32),
                    done_val=0.0)
    return s


# =====================================================================
# resetWorld (src/gen.cpp:216-316)
# =====================================================================

def reset_world(cfg: SimConfig, s: State, reset_u: jax.Array) -> State:
    g = s.game

    # --- Part 1: GameState (quarter rollover for full games vs fresh
    # re-init for 1v1/manual resets; src/gen.cpp:221-256) ---
    rollover = (g.game_clock <= 0.0) & (g.is_one_on_one == 0)
    cont = (g.period < 4.0) | (g.team0_score == g.team1_score)
    rc = rollover & cont

    def pick(roll_val, fresh_val):
        return jnp.where(rollover, roll_val, fresh_val)

    g = g.replace(
        period=pick(jnp.where(rc, g.period + 1.0, g.period), 1.0),
        game_clock=pick(jnp.where(rc, cfg.time_per_period, g.game_clock),
                        cfg.time_per_period),
        shot_clock=pick(jnp.where(rc, cfg.shot_clock_duration, g.shot_clock),
                        cfg.shot_clock_duration),
        live_ball=pick(jnp.where(rc, 1, 0), 1).astype(I32),
        inbounding_in_progress=pick(
            jnp.where(rc, 0, g.inbounding_in_progress), 0).astype(I32),
        team_in_possession=pick(g.team_in_possession, 0.0),
        team0_score=pick(g.team0_score, 0.0),
        team1_score=pick(g.team1_score, 0.0),
        scored_baskets=pick(g.scored_baskets, 0.0),
        oob_count=pick(g.oob_count, 0.0),
        inbound_clock=pick(g.inbound_clock, 0.0),
        # hoop ids and isOneOnOne preserved in both branches
    )
    s = s.replace(game=g)

    # --- Parts 2-4: agents, ball, hoops (always run; src/gen.cpp:267-315)
    s = _reset_agent_common(cfg, s, done_val=1.0, colors=C.RESET_TEAM_COLORS)
    s, ball_spawn = _setup_agent_positions(cfg, s, reset_u)
    s = _reset_ball(cfg, s, ball_spawn, done_val=1.0)
    s = s.replace(hoops=s.hoops.replace(
        reset=jnp.zeros_like(s.hoops.reset),
        done=jnp.ones_like(s.hoops.done),
        cur_step=jnp.zeros_like(s.hoops.cur_step),
    ))
    return s


# =====================================================================
# 14. resetSystem (src/game.cpp:957-967)
# =====================================================================

def reset_system(cfg: SimConfig, s: State, reset_u: jax.Array) -> State:
    do = s.reset_now == 1
    fresh = reset_world(cfg, s, reset_u)
    out = tree_select(do, fresh, s)
    return out.replace(reset_now=jnp.where(do, 0, out.reset_now))


# =====================================================================
# The step: 18-system chain + RNG plumbing
# =====================================================================

def step_core(cfg: SimConfig, s: State, noise: S.StepNoise) -> State:
    """One simulation tick, systems in the reference taskgraph order
    (src/game.cpp:1463-1526)."""
    s = S.tick_system(cfg, s)
    s = S.action_mask_system(cfg, s)
    s = S.move_agent_system(cfg, s)
    s = S.grab_system(cfg, s)
    s = S.pass_system(cfg, s)
    s = S.shoot_system(cfg, s, noise)
    s = S.move_ball_system(cfg, s)
    s = S.update_shot_pct_system(cfg, s)
    s = S.score_system(cfg, s)
    s = S.out_of_bounds_system(cfg, s)
    s = S.update_last_touch_system(cfg, s)
    s = S.clock_system(cfg, s)
    s = S.inbound_violation_system(cfg, s)
    s = reset_system(cfg, s, noise.reset_u)
    s = S.update_points_worth_system(cfg, s)
    s = S.agent_collision_system(cfg, s)
    s = S.hard_code_defense_system(cfg, s)
    s = S.fill_observations_system(cfg, s)
    s = S.reward_system(cfg, s)
    return s


def step(cfg: SimConfig, s: State) -> State:
    """Draw this step's noise from the per-world key, then run the chain."""
    key, nk = jax.random.split(s.key)
    noise = S.draw_noise(cfg, nk)
    return step_core(cfg, s.replace(key=key), noise)


# =====================================================================
# Batched (multi-world) API
# =====================================================================

@functools.partial(jax.jit, static_argnums=(0, 2))
def init_batch(cfg: SimConfig, key: jax.Array, num_worlds: int) -> State:
    """Create `num_worlds` independent worlds (leading world axis).

    Unlike the reference — which seeds every world with the *same* RNG
    stream (rand::split_i(key, 0, 0) for all worlds, src/sim.cpp:89) — each
    world gets its own fold-in of the root key so spawns actually vary
    across worlds.

    Jitted (cfg and num_worlds static): eager execution dispatches every
    primitive separately, which through the axon tunnel costs ~100-200 s
    per fresh process (bench_logs/r5 compile stage) — one compiled program
    costs seconds.
    """
    keys = jax.random.split(key, num_worlds)
    return jax.vmap(lambda k: generate_world(cfg, k))(keys)


@functools.partial(jax.jit, static_argnums=0)
def step_batch(cfg: SimConfig, s: State) -> State:
    """The whole-fleet lockstep step — the megakernel equivalent."""
    return jax.vmap(lambda w: step(cfg, w))(s)


def make_step_fn(cfg: SimConfig):
    """A jitted batched step closed over a static config."""

    @jax.jit
    def fn(s: State) -> State:
        return jax.vmap(lambda w: step(cfg, w))(s)

    return fn
