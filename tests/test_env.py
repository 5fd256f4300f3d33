"""Env wrapper + export API tests."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu import engine
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.env import BasketballEnv

CFG = SimConfig()


def test_export_shapes():
    """Shapes/dtypes of the 18-tensor export match the reference table
    (SURVEY §2.4, src/mgr.cpp:315-445)."""
    env = BasketballEnv(4, CFG, seed=0)
    t = env.tensors()
    expect = {
        "reset": ((4, 2, 1), jnp.int32),
        "action": ((4, 2, 6), jnp.int32),
        "action_mask": ((4, 2, 4), jnp.int32),
        "observations": ((4, 2, 128), jnp.float32),
        "reward": ((4, 2), jnp.float32),
        "done": ((4, 2), jnp.float32),
        "agent_pos": ((4, 2, 3), jnp.float32),
        "orientation": ((4, 2, 4), jnp.float32),
        "agent_possession": ((4, 2, 3), jnp.int32),
        "agent_team": ((4, 2, 5), jnp.int32),
        "agent_stats": ((4, 2, 2), jnp.int32),
        "agent_entity_id": ((4, 2), jnp.int32),
        "basketball_pos": ((4, 1, 3), jnp.float32),
        "ball_physics": ((4, 1, 7), jnp.int32),
        "ball_grabbed": ((4, 1, 2), jnp.int32),
        "ball_velocity": ((4, 1, 3), jnp.float32),
        "ball_entity_id": ((4, 1), jnp.int32),
        "hoop_pos": ((4, 2, 3), jnp.float32),
        "game_state": ((4, 14), jnp.float32),
    }
    assert set(t) == set(expect)
    for name, (shape, dtype) in expect.items():
        assert t[name].shape == shape, f"{name}: {t[name].shape}"
        assert t[name].dtype == dtype, f"{name}: {t[name].dtype}"


def test_reset_pulse_semantics():
    """env.reset marks done=1 without repositioning (SURVEY §3.3)."""
    env = BasketballEnv(4, CFG, seed=1)
    pos_before = np.asarray(env.state.agents.pos)
    obs, rew, done = env.reset()
    assert np.all(np.asarray(done) == 1.0)
    # reset flags cleared afterwards
    assert np.all(np.asarray(env.state.agents.reset) == 0)
    # cur_step zeroed
    assert np.all(np.asarray(env.state.agents.cur_step) == 0)
    # next step: dones drop back to 0 (unless a game event resets)
    obs, rew, done = env.step(env.get_blank_actions())
    assert np.all(np.asarray(done) == 0.0)
    # agents moved by at most one integration step, not respawned
    drift = np.abs(np.asarray(env.state.agents.pos) - pos_before).max()
    assert drift < 1.0


def test_step_writes_only_trainee_slice():
    env = BasketballEnv(4, CFG, seed=2, trainee_agent_idx=0)
    env.reset()
    acts = jnp.ones((4, 6), jnp.int32)
    env.step(acts)
    # trainee slice was consumed by the sim (grab is consumed; move stays 1
    # unless hardcode defense overwrote it — trainee is agent 0 = offense in
    # possession, for which hardCodeDefense writes move=0).
    a = np.asarray(env.state.agents.action)
    assert a.shape == (4, 2, 6)


def test_batched_equals_single_world():
    """vmap lockstep == stepping each world alone (same per-world keys)."""
    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    batched = jax.vmap(lambda k: engine.generate_world(CFG, k))(keys)
    singles = [engine.generate_world(CFG, k) for k in keys]

    step_b = engine.make_step_fn(CFG)
    step_one = jax.jit(lambda w: engine.step(CFG, w))
    for _ in range(3):
        batched = step_b(batched)
        singles = [step_one(s) for s in singles]

    for i, s in enumerate(singles):
        np.testing.assert_allclose(np.asarray(batched.agents.pos[i]),
                                   np.asarray(s.agents.pos), atol=1e-6)
        np.testing.assert_allclose(np.asarray(batched.agents.obs[i]),
                                   np.asarray(s.agents.obs), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(batched.ball.holder[i]),
                                      np.asarray(s.ball.holder))


def test_determinism_same_seed():
    e1 = BasketballEnv(4, CFG, seed=11)
    e2 = BasketballEnv(4, CFG, seed=11)
    e1.reset()
    e2.reset()
    acts = jnp.zeros((4, 6), jnp.int32)
    for _ in range(5):
        o1, r1, d1 = e1.step(acts)
        o2, r2, d2 = e2.step(acts)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_worlds_differ_across_seeds_and_indices():
    """Unlike the reference (all worlds share one RNG stream,
    src/sim.cpp:89), our worlds spawn independently."""
    env = BasketballEnv(4, CFG, seed=3)
    pos = np.asarray(env.state.agents.pos)
    assert np.unique(np.round(pos[:, 0, 0], 3)).size > 2


def test_frozen_policy_drives_opponent():
    calls = []

    def frozen(obs):
        calls.append(obs.shape)
        return jnp.ones((obs.shape[0], 6), jnp.int32)

    env = BasketballEnv(4, CFG, seed=4, frozen_policy=frozen,
                        trainee_agent_idx=0)
    env.reset()
    env.step(jnp.zeros((4, 6), jnp.int32))
    assert len(calls) >= 1 and calls[0] == (4, 128)


def test_bitcast_compat_export():
    env = BasketballEnv(4, CFG, seed=5)
    t = env.tensors(bitcast_compat=True)
    gs = np.asarray(t["game_state"])
    # int32 1 reinterpreted as float32 = 1.4e-45 (the reference quirk,
    # SURVEY §2.4): liveBall slot must be denormal-tiny, not 1.0.
    assert 0 < gs[0, 1] < 1e-40


def test_chunked_eval_matches_per_step(tmp_path):
    """Chunked eval (on-device while_loop, one dispatch per chunk) ==
    the per-step reference loop EXACTLY: same npz rows, same episode
    counts, same final sim state — including the early exit at the
    precise tick every env completes its episodes (round-3 fix; the
    round-2 version could overshoot by up to K-1 steps)."""
    from madrona_basketball_tpu.infer import infer
    from madrona_basketball_tpu.models.agent import init_agent

    cfg = SimConfig(time_per_period=1.0)  # fast episode turnover
    net, ap = init_agent(jax.random.PRNGKey(2))

    def run(chunk_size):
        env = BasketballEnv(3, cfg, seed=4)
        path = str(tmp_path / f"traj_k{chunk_size}.npz")
        counts = infer(env, net, ap, log_path=path, num_episodes=1,
                       max_steps=500, stochastic=False, seed=0,
                       trainee_idx=1, chunk_size=chunk_size)
        return np.array(counts), dict(np.load(path)), env.state

    c1, log1, st1 = run(1)    # per-step reference path
    c8, log8, st8 = run(8)    # chunked path (uneven completion tick)
    np.testing.assert_array_equal(c1, c8)
    assert set(log1) == set(log8)
    for k in log1:
        np.testing.assert_array_equal(log1[k], log8[k], err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(st1),
                    jax.tree_util.tree_leaves(st8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
