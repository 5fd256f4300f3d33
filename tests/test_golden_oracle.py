"""Golden tests: JAX engine vs the independent scalar NumPy oracle.

Strategy: walk a real trajectory with randomized actions; at every step,
sync the oracle to the engine's exact state, advance BOTH by one step with
identical pre-drawn noise, and compare every component column.  Re-syncing
each step means divergence cannot accumulate — each comparison validates one
state transition from an identical input, across hundreds of distinct game
situations (shots, steals, resets, inbounds, collisions, clock expiry).
Event counters assert that the paths we care about were actually exercised.
"""

import functools
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu import engine
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.systems import StepNoise

from .oracle.oracle import OracleWorld

BUCKETS = np.array(C.ACTION_BUCKETS)


def _assert_close(name, got, want, t, atol=2e-4, rtol=2e-4):
    got = np.asarray(got)
    want = np.asarray(want)
    if np.issubdtype(got.dtype, np.integer):
        ok = np.array_equal(got, want)
    else:
        ok = np.allclose(got, want, atol=atol, rtol=rtol)
    assert ok, (f"step {t}: mismatch in {name}:\n engine={got}\n"
                f" oracle={want}")


def _compare(s_np, world: OracleWorld, t: int):
    a = s_np.agents
    for i, ag in enumerate(world.agents):
        _assert_close(f"agent{i}.pos", a.pos[i], ag.pos, t)
        _assert_close(f"agent{i}.vel", a.vel[i], ag.vel, t)
        _assert_close(f"agent{i}.orient", a.orient[i], ag.orient, t)
        _assert_close(f"agent{i}.action", a.action[i], ag.action, t)
        _assert_close(f"agent{i}.mask", a.action_mask[i], ag.mask, t)
        _assert_close(f"agent{i}.reward", a.reward[i], ag.reward, t)
        _assert_close(f"agent{i}.done", a.done[i], ag.done, t)
        _assert_close(f"agent{i}.cur_step", a.cur_step[i], ag.cur_step, t)
        _assert_close(f"agent{i}.has_ball", a.has_ball[i], ag.has_ball, t)
        _assert_close(f"agent{i}.held", a.held_ball_id[i], ag.held_ball_id, t)
        _assert_close(f"agent{i}.pw", a.points_worth[i], ag.points_worth, t)
        _assert_close(f"agent{i}.inb", a.im_inbounding[i], ag.im_inbounding, t)
        _assert_close(f"agent{i}.cooldown", a.grab_cooldown[i], ag.cooldown, t)
        _assert_close(f"agent{i}.stat_points", a.stat_points[i],
                      ag.stat_points, t)
        _assert_close(f"agent{i}.target", a.target_pos[i], ag.target_pos, t)
        _assert_close(f"agent{i}.shot_pct", a.shot_pct[i], ag.shot_pct, t)
        _assert_close(f"agent{i}.obs", a.obs[i], ag.obs, t)
    b, ob = s_np.ball, world.ball
    _assert_close("ball.pos", b.pos, ob.pos, t)
    _assert_close("ball.vel", b.vel, ob.vel, t)
    for f in ("grabbed", "holder", "in_flight", "last_touched_agent",
              "last_touched_team", "shot_by_agent", "shot_by_team",
              "shot_point_value", "shot_going_in"):
        _assert_close(f"ball.{f}", getattr(b, f), getattr(ob, f), t)
    g, og = s_np.game, world.game
    for f in ("inbounding_in_progress", "live_ball", "period",
              "team_in_possession", "team0_score", "team1_score",
              "game_clock", "shot_clock", "scored_baskets", "oob_count",
              "inbound_clock", "is_one_on_one"):
        _assert_close(f"game.{f}", getattr(g, f), getattr(og, f), t)
    _assert_close("reset_now", s_np.reset_now, world.reset_now, t)


def _run(cfg: SimConfig, seed: int, n_steps: int,
         start_state=None, action_prob: float = 0.7) -> Counter:
    if start_state is None:
        s = engine.generate_world(cfg, jax.random.PRNGKey(seed))
    else:
        s = start_state
    world = OracleWorld(cfg)
    rng = np.random.RandomState(seed)
    step_fn = jax.jit(functools.partial(engine.step_core, cfg))

    events = Counter()
    s_np = jax.device_get(s)  # kept in sync with `s` below
    for t in range(n_steps):
        cur = np.asarray(s_np.agents.action).copy()
        for i in range(cfg.num_agents):
            if rng.rand() < action_prob:  # else keep hardcoded-defense acts
                cur[i] = rng.randint(0, BUCKETS)
        s = s.replace(agents=s.agents.replace(action=jnp.asarray(cur)))
        s_np = s_np.replace(agents=s_np.agents.replace(action=cur))

        world.load_state(s_np)

        shot_u = rng.uniform(-1, 1, (cfg.num_agents, 3)).astype(np.float32)
        reset_u = np.array([rng.uniform(-1, 1), rng.uniform(-1, 1),
                            rng.uniform(0, 1)], np.float32)
        noise = StepNoise(shot_u=jnp.asarray(shot_u),
                          reset_u=jnp.asarray(reset_u))

        s = step_fn(s, noise)
        world.step(shot_u, reset_u)

        s_np = jax.device_get(s)
        _compare(s_np, world, t)

        if float(s_np.agents.done[0]) > 0.5:
            events["reset"] += 1
        if int(s_np.ball.in_flight) == 1:
            events["in_flight"] += 1
        if int(s_np.game.inbounding_in_progress) == 1:
            events["inbounding"] += 1
        if int(s_np.ball.grabbed) == 1:
            events["grabbed"] += 1
        if float(s_np.game.period) > 1.5:
            events["rollover"] += 1
        events["score_total"] = max(events["score_total"],
                                    int(s_np.game.team0_score +
                                        s_np.game.team1_score))
    return events


def test_golden_tag_mode():
    """Snapshot configuration: 1v1 with the FOR-TAG overrides active."""
    events = _run(SimConfig(one_on_one=True, tag_mode=True), seed=0,
                  n_steps=400)
    assert events["reset"] > 0, "no episode resets exercised"
    assert events["in_flight"] > 0, "no shots exercised"


def test_golden_one_on_one_full_rules():
    """1v1 without tag overrides: grab/steal/pass live.  700 steps passes
    the 10 s game clock (620 live-ball ticks) so at least the clock-expiry
    reset fires."""
    events = _run(SimConfig(one_on_one=True, tag_mode=False), seed=1,
                  n_steps=700)
    assert events["reset"] > 0
    assert events["grabbed"] > 0


def test_golden_full_game_rollover():
    """Full-game mode random walk: quarter rollover at the 10 s clock."""
    events = _run(SimConfig(one_on_one=False, tag_mode=False), seed=2,
                  n_steps=700)
    assert events["rollover"] > 0, "no quarter rollover exercised"


def _surgery(cfg, seed, **edits):
    """Build a world and apply direct field edits to stage a scenario."""
    s = engine.generate_world(cfg, jax.random.PRNGKey(seed))
    ball_edits = {k[5:]: v for k, v in edits.items()
                  if k.startswith("ball_")}
    game_edits = {k[5:]: v for k, v in edits.items()
                  if k.startswith("game_")}
    agent_edits = {k[6:]: v for k, v in edits.items()
                   if k.startswith("agent_")}
    if ball_edits:
        s = s.replace(ball=s.ball.replace(
            **{k: jnp.asarray(v, getattr(s.ball, k).dtype)
               for k, v in ball_edits.items()}))
    if game_edits:
        s = s.replace(game=s.game.replace(
            **{k: jnp.asarray(v, getattr(s.game, k).dtype)
               for k, v in game_edits.items()}))
    if agent_edits:
        ag = s.agents
        for k, v in agent_edits.items():
            ag = ag.replace(**{k: jnp.asarray(v, getattr(ag, k).dtype)})
        s = s.replace(agents=ag)
    return s


def test_golden_full_game_oob_inbound():
    """Staged out-of-bounds ball -> dead ball + inbound assignment
    (src/game.cpp:1084-1111)."""
    cfg = SimConfig(one_on_one=False, tag_mode=False)
    s = _surgery(cfg, 10,
                 ball_pos=[0.5, 8.5, 0.0],     # outside COURT_MIN_X
                 ball_last_touched_team=0)
    events = _run(cfg, seed=10, n_steps=40, start_state=s)
    assert events["inbounding"] > 0


def test_golden_full_game_score_and_inbound():
    """Staged made shot: ball in flight entering the scoring zone ->
    points + baseline inbound (src/game.cpp:888-951)."""
    cfg = SimConfig(one_on_one=False, tag_mode=False)
    s = _surgery(cfg, 11,
                 ball_pos=[28.70, 8.5, 0.0],   # at hoop 1's zone
                 ball_in_flight=1,
                 ball_shot_by_agent=C.AGENT_IDS[0],
                 ball_shot_by_team=0,
                 ball_shot_point_value=3,
                 ball_shot_going_in=1,
                 ball_grabbed=0,
                 agent_has_ball=[0, 0])
    events = _run(cfg, seed=11, n_steps=40, start_state=s)
    assert events["score_total"] >= 3
    assert events["inbounding"] > 0


def test_golden_full_game_inbound_violation():
    """Staged 5-second violation: inbound clock expires -> turnover
    (src/game.cpp:1116-1157)."""
    cfg = SimConfig(one_on_one=False, tag_mode=False)
    s = _surgery(cfg, 12,
                 game_inbounding_in_progress=1,
                 game_inbound_clock=0.05,
                 game_live_ball=0,
                 agent_im_inbounding=[1, 0],
                 agent_has_ball=[1, 0],
                 agent_held_ball_id=[C.BALL_ID, C.ENTITY_ID_PLACEHOLDER],
                 ball_grabbed=1,
                 ball_holder=C.AGENT_IDS[0])
    # action_prob=0: no random actions, so the inbounder holds until the
    # 5-second clock expires and the violation turnover fires.
    events = _run(cfg, seed=12, n_steps=30, start_state=s, action_prob=0.0)
    assert events["inbounding"] > 0


@pytest.mark.slow
def test_golden_long_tag():
    """Extended soak of the snapshot config (deselect with -m 'not slow')."""
    events = _run(SimConfig(one_on_one=True, tag_mode=True), seed=3,
                  n_steps=800)
    assert events["reset"] > 0
