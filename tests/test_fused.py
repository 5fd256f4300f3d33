"""Fused (flat-row) step vs the structured engine, and Pallas-vs-XLA."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu import engine
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.engine_fused import noise_to_rows
from madrona_basketball_tpu.ops import layout
from madrona_basketball_tpu.ops.fused_step import (fused_step_xla,
                                                   make_fused_step)
from madrona_basketball_tpu.systems import StepNoise

W = 8


def _rand_noise(rng, w):
    shot = rng.uniform(-1, 1, (w, C.NUM_AGENTS, 3)).astype(np.float32)
    reset = np.stack([rng.uniform(-1, 1, w), rng.uniform(-1, 1, w),
                      rng.uniform(0, 1, w)], axis=1).astype(np.float32)
    return shot, reset


def _compare_states(s_ref, s_fused, t, atol=3e-4):
    """Structured-engine state vs unpacked fused state."""
    for name, a, b in [
        ("pos", s_ref.agents.pos, s_fused.agents.pos),
        ("vel", s_ref.agents.vel, s_fused.agents.vel),
        ("orient_abs", jnp.abs(s_ref.agents.orient),
         jnp.abs(s_fused.agents.orient)),
        ("reward", s_ref.agents.reward, s_fused.agents.reward),
        ("done", s_ref.agents.done, s_fused.agents.done),
        ("cooldown", s_ref.agents.grab_cooldown,
         s_fused.agents.grab_cooldown),
        ("shot_pct", s_ref.agents.shot_pct, s_fused.agents.shot_pct),
        ("target", s_ref.agents.target_pos, s_fused.agents.target_pos),
        ("obs", s_ref.agents.obs, s_fused.agents.obs),
        ("ball_pos", s_ref.ball.pos, s_fused.ball.pos),
        ("ball_vel", s_ref.ball.vel, s_fused.ball.vel),
        ("clocks", s_ref.game.game_clock, s_fused.game.game_clock),
    ]:
        got, want = np.asarray(b), np.asarray(a)
        if name == "obs":
            # quat components may differ in sign convention at exact 180deg
            # flips; compare magnitudes there and values elsewhere.
            ok = np.allclose(got, want, atol=atol) or np.allclose(
                np.abs(got), np.abs(want), atol=atol)
            assert ok, f"step {t}: obs mismatch; max diff " \
                f"{np.abs(got - want).max()}"
        else:
            np.testing.assert_allclose(
                got, want, atol=atol, rtol=1e-3,
                err_msg=f"step {t}: mismatch in {name}")
    for name in ("has_ball", "held_ball_id", "points_worth", "im_inbounding",
                 "action", "action_mask", "cur_step", "team",
                 "defending_hoop"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_fused.agents, name)),
            np.asarray(getattr(s_ref.agents, name)),
            err_msg=f"step {t}: int mismatch agents.{name}")
    for name in ("grabbed", "holder", "in_flight", "shot_by_agent",
                 "shot_point_value", "shot_going_in", "last_touched_team"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_fused.ball, name)),
            np.asarray(getattr(s_ref.ball, name)),
            err_msg=f"step {t}: int mismatch ball.{name}")
    for name in ("inbounding_in_progress", "live_ball", "is_one_on_one"):
        np.testing.assert_array_equal(
            np.asarray(getattr(s_fused.game, name)),
            np.asarray(getattr(s_ref.game, name)),
            err_msg=f"step {t}: int mismatch game.{name}")


def _run_fused_vs_engine(cfg, n_steps=40):
    """Per-step resync: structured engine and flat fused step agree on every
    transition along a trajectory with randomized actions."""
    rng = np.random.RandomState(3)
    s = jax.vmap(lambda k: engine.generate_world(cfg, k))(
        jax.random.split(jax.random.PRNGKey(0), W))
    step_ref = jax.jit(jax.vmap(functools.partial(engine.step_core, cfg)))
    pack = jax.jit(layout.pack)

    for t in range(n_steps):
        acts = rng.randint(0, [2, 8, 3, 2, 2, 2],
                           size=(W, C.NUM_AGENTS, 6)).astype(np.int32)
        s = s.replace(agents=s.agents.replace(action=jnp.asarray(acts)))

        shot, reset = _rand_noise(rng, W)
        noise_b = StepNoise(shot_u=jnp.asarray(shot),
                            reset_u=jnp.asarray(reset))
        sf, si = pack(s)
        rows = noise_to_rows(jnp.asarray(shot), jnp.asarray(reset))

        s = step_ref(s, noise_b)
        sf2, si2, obs2 = fused_step_xla(cfg, sf, si, rows)
        s_fused = layout.unpack(cfg, sf2, si2, s.key, obs=obs2)
        _compare_states(s, s_fused, t)


def test_fused_matches_engine_tag():
    _run_fused_vs_engine(SimConfig(one_on_one=True, tag_mode=True))


def test_fused_matches_engine_full_game():
    _run_fused_vs_engine(SimConfig(one_on_one=False, tag_mode=False))


@pytest.mark.slow
def test_fused_matches_engine_one_on_one():
    _run_fused_vs_engine(SimConfig(one_on_one=True, tag_mode=False))


def test_pack_unpack_roundtrip():
    cfg = SimConfig()
    s = jax.vmap(lambda k: engine.generate_world(cfg, k))(
        jax.random.split(jax.random.PRNGKey(5), W))
    sf, si = layout.pack(s)
    s2 = layout.unpack(cfg, sf, si, s.key)
    np.testing.assert_allclose(np.asarray(s2.agents.pos),
                               np.asarray(s.agents.pos))
    np.testing.assert_allclose(np.asarray(s2.agents.orient),
                               np.asarray(s.agents.orient))
    np.testing.assert_array_equal(np.asarray(s2.ball.holder),
                                  np.asarray(s.ball.holder))
    np.testing.assert_allclose(np.asarray(s2.hoops.pos),
                               np.asarray(s.hoops.pos))
    np.testing.assert_array_equal(np.asarray(s2.game.is_one_on_one),
                                  np.asarray(s.game.is_one_on_one))


def test_pallas_interpret_matches_xla():
    """The Pallas kernel (interpret mode on CPU) == the XLA row path."""
    cfg = SimConfig()
    worlds = 256
    s = jax.vmap(lambda k: engine.generate_world(cfg, k))(
        jax.random.split(jax.random.PRNGKey(7), worlds))
    rng = np.random.RandomState(1)
    acts = rng.randint(0, [2, 8, 3, 2, 2, 2],
                       size=(worlds, C.NUM_AGENTS, 6)).astype(np.int32)
    s = s.replace(agents=s.agents.replace(action=jnp.asarray(acts)))
    sf, si = layout.pack(s)
    shot, reset = _rand_noise(rng, worlds)
    rows = noise_to_rows(jnp.asarray(shot), jnp.asarray(reset))

    sf_x, si_x, obs_x = fused_step_xla(cfg, sf, si, rows)
    kernel = make_fused_step(cfg, worlds, block=128, interpret=True)
    sf_p, si_p, obs_p = kernel(sf, si, rows)

    np.testing.assert_allclose(np.asarray(sf_p), np.asarray(sf_x), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(si_p), np.asarray(si_x))
    np.testing.assert_allclose(np.asarray(obs_p), np.asarray(obs_x),
                               atol=1e-5)


def test_multistep_matches_sequential_single_steps():
    """K-tick kernel (interpret mode, external noise) == K sequential
    single-step calls on identical draws — proves the in-kernel loop
    advances the VMEM-resident state exactly like K separate launches."""
    from madrona_basketball_tpu.ops.fused_step import (make_fused_multistep,
                                                       pack_multistep_noise)
    cfg = SimConfig()
    worlds, K = 256, 5
    s = engine.init_batch(cfg, jax.random.PRNGKey(0), worlds)
    sf, si = layout.pack(s)
    rng = np.random.RandomState(3)
    chunks = []
    for _ in range(K):
        shot, reset = _rand_noise(rng, worlds)
        chunks.append(noise_to_rows(jnp.asarray(shot), jnp.asarray(reset)))
    noise = pack_multistep_noise(chunks)

    ms = make_fused_multistep(cfg, worlds, K, block=128, interpret=True,
                              external_noise=True)
    sf_m, si_m, obs_m = ms(noise, sf, si)

    sf_s, si_s = sf, si
    for t in range(K):
        sf_s, si_s, obs_s = fused_step_xla(cfg, sf_s, si_s, chunks[t])

    np.testing.assert_allclose(np.asarray(sf_m), np.asarray(sf_s), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(si_m), np.asarray(si_s))
    np.testing.assert_allclose(np.asarray(obs_m), np.asarray(obs_s),
                               atol=1e-5)


def test_step_fields_skip_obs_same_state():
    """compute_obs=False must not change the state transition (obs feeds
    nothing downstream; reward runs either way)."""
    from madrona_basketball_tpu.ops.fused_step import (_load_dicts,
                                                       _noise_dict,
                                                       _store_rows,
                                                       step_fields)
    cfg = SimConfig()
    worlds = 64
    s = engine.init_batch(cfg, jax.random.PRNGKey(2), worlds)
    sf, si = layout.pack(s)
    rng = np.random.RandomState(4)
    shot, reset = _rand_noise(rng, worlds)
    rows = noise_to_rows(jnp.asarray(shot), jnp.asarray(reset))

    def run(compute_obs):
        ag, ball, game, hoops = _load_dicts(list(sf), list(si))
        ag, ball, game, hoops, obs = step_fields(
            cfg, ag, ball, game, hoops, _noise_dict(list(rows)),
            compute_obs=compute_obs)
        sf2, si2 = _store_rows(ag, ball, game, hoops)
        return jnp.stack(sf2), jnp.stack(si2), obs

    sf_a, si_a, obs_a = run(True)
    sf_b, si_b, obs_b = run(False)
    assert obs_a and obs_b == []
    np.testing.assert_allclose(np.asarray(sf_a), np.asarray(sf_b))
    np.testing.assert_array_equal(np.asarray(si_a), np.asarray(si_b))


def test_step_many_xla_fallback_matches_steps():
    """FusedEngine.step_many on the XLA backend == n x step() (the
    fallback literally loops step; this pins the API contract)."""
    from madrona_basketball_tpu.engine_fused import FusedEngine
    cfg = SimConfig()
    e1 = FusedEngine(cfg, 32, seed=5, backend="xla")
    e2 = FusedEngine(cfg, 32, seed=5, backend="xla")
    e1.step_many(4)
    for _ in range(4):
        e2.step()
    np.testing.assert_allclose(np.asarray(e1.sf), np.asarray(e2.sf))
    np.testing.assert_array_equal(np.asarray(e1.si), np.asarray(e2.si))


def test_multistep_2d_layout_matches_sequential():
    """W=1024 routes through the (8, W/8) 2-D tile layout; same
    equivalence proof as the 1-D test."""
    from madrona_basketball_tpu.ops.fused_step import (make_fused_multistep,
                                                       pack_multistep_noise)
    cfg = SimConfig()
    worlds, K = 1024, 2
    s = engine.init_batch(cfg, jax.random.PRNGKey(4), worlds)
    sf, si = layout.pack(s)
    rng = np.random.RandomState(6)
    chunks = []
    for _ in range(K):
        shot, reset = _rand_noise(rng, worlds)
        chunks.append(noise_to_rows(jnp.asarray(shot), jnp.asarray(reset)))
    noise = pack_multistep_noise(chunks)

    ms = make_fused_multistep(cfg, worlds, K, interpret=True,
                              external_noise=True)
    sf_m, si_m, obs_m = ms(noise, sf, si)

    sf_s, si_s = sf, si
    for t in range(K):
        sf_s, si_s, obs_s = fused_step_xla(cfg, sf_s, si_s, chunks[t])

    np.testing.assert_allclose(np.asarray(sf_m), np.asarray(sf_s), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(si_m), np.asarray(si_s))
    np.testing.assert_allclose(np.asarray(obs_m), np.asarray(obs_s),
                               atol=1e-5)


def test_multistep_obs_every_tick_and_blank_agent():
    """The honest-benchmark variant (obs_every_tick=True, blank_agent=0)
    must walk the same trajectory as sequential single steps that zero
    agent 0's action rows before each tick (scripts/run.py semantics),
    and its obs output must equal the FINAL tick's obs."""
    from madrona_basketball_tpu.ops import layout as L
    from madrona_basketball_tpu.ops.fused_step import (make_fused_multistep,
                                                       pack_multistep_noise)
    cfg = SimConfig()
    worlds, K = 256, 4
    s = engine.init_batch(cfg, jax.random.PRNGKey(7), worlds)
    sf, si = layout.pack(s)
    rng = np.random.RandomState(9)
    chunks = []
    for _ in range(K):
        shot, reset = _rand_noise(rng, worlds)
        chunks.append(noise_to_rows(jnp.asarray(shot), jnp.asarray(reset)))
    noise = pack_multistep_noise(chunks)

    ms = make_fused_multistep(cfg, worlds, K, block=128, interpret=True,
                              external_noise=True, obs_every_tick=True,
                              blank_agent=0)
    sf_m, si_m, obs_m = ms(noise, sf, si)

    blank_rows = [L.I_IDX[f"a0.{n}"] for n in
                  ("a_move", "a_angle", "a_rotate", "a_grab", "a_pass",
                   "a_shoot")]
    sf_s, si_s = sf, si
    for t in range(K):
        for r in blank_rows:
            si_s = si_s.at[r].set(0)
        sf_s, si_s, obs_s = fused_step_xla(cfg, sf_s, si_s, chunks[t])

    np.testing.assert_allclose(np.asarray(sf_m), np.asarray(sf_s), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(si_m), np.asarray(si_s))
    np.testing.assert_allclose(np.asarray(obs_m), np.asarray(obs_s),
                               atol=1e-5)


def test_pick_block():
    from madrona_basketball_tpu.ops.fused_step import MAX_BLOCK, pick_block
    assert pick_block(8192) == 2048          # preferred split
    assert pick_block(8192, 8192) == MAX_BLOCK
    assert pick_block(1024) == 1024          # whole array
    assert pick_block(3000) == 3000          # no 128-multiple divisor
    assert pick_block(256, 128) == 128
    assert pick_block(64) == 64              # tiny whole array
    assert pick_block(6144) == 2048
    with pytest.raises(ValueError):
        pick_block(8192 + 8, 2048, max_block=2048)  # 8200: no split fits
