"""End-to-end: inference writes an npz trajectory; the viewer parses and
renders it (headless)."""

import os

import jax
import numpy as np
import pytest

from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.env import BasketballEnv
from madrona_basketball_tpu.infer import infer
from madrona_basketball_tpu.models.agent import init_agent

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
os.environ.setdefault("SDL_AUDIODRIVER", "dummy")


@pytest.fixture(scope="module")
def trajectory_npz(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("logs") / "traj.npz")
    cfg = SimConfig()
    env = BasketballEnv(4, cfg, seed=0)
    net, ap = init_agent(jax.random.PRNGKey(1))
    infer(env, net, ap, log_path=path, num_episodes=1, max_steps=25,
          stochastic=True, seed=0, trainee_idx=1)
    return path


def test_npz_schema(trajectory_npz):
    raw = dict(np.load(trajectory_npz, allow_pickle=True))
    # The reference viewer's expected keys (scripts/infer.py:116-129).
    for key in ("agent_pos", "ball_pos", "ball_vel", "orientation",
                "ball_physics", "agent_possession", "game_state", "rewards",
                "actions", "done", "hoop_pos"):
        assert key in raw, key
    T = raw["done"].shape[0]
    assert raw["agent_pos"].shape == (T, 4, 2, 3)
    assert raw["ball_physics"].shape == (T, 4, 1, 7)
    assert raw["game_state"].shape == (T, 4, 14)


def test_viewer_parse_and_render(trajectory_npz):
    from madrona_basketball_tpu.viewer.app import ViewerClass

    raw, episodes, events = ViewerClass.load_and_parse_log(trajectory_npz)
    assert len(episodes) >= 1
    viewer = ViewerClass(headless=True)
    t = 0
    hp = np.asarray(raw["hoop_pos"]).reshape(-1, 3)
    viewer._draw_frame(raw["agent_pos"][t, 0], raw["orientation"][t, 0],
                       raw["ball_pos"][t, 0, 0], hp,
                       raw["game_state"][t, 0],
                       possession=raw["agent_possession"][t, 0])
    viewer.pg.display.flip()


def test_track_event_filter(trajectory_npz):
    """--track-event semantics (scripts/viewer.py:1060): a single key
    parses only that event family; 'none' parses nothing; 'all' is the
    union of the single-event parses."""
    from madrona_basketball_tpu.viewer.app import ViewerClass

    _, _, all_events = ViewerClass.load_and_parse_log(trajectory_npz,
                                                      track_event="all")
    _, _, none_events = ViewerClass.load_and_parse_log(trajectory_npz,
                                                       track_event="none")
    assert none_events == []
    singles = []
    for name in ("shoot", "pass", "grab"):
        _, _, ev = ViewerClass.load_and_parse_log(trajectory_npz,
                                                  track_event=name)
        assert all(e["name"] == name for e in ev)
        singles.extend(ev)
    key = lambda e: (e["step"], e["name"], e["agent"])  # noqa: E731
    assert sorted(map(key, singles)) == sorted(map(key, all_events))


def test_mgi_playlist_sorting(tmp_path):
    """--watch-model plays logs/mgi/{model}_/ sorted by (gen, iter) with
    the initial drop first (scripts/viewer.py:1118-1136)."""
    from madrona_basketball_tpu.viewer.__main__ import mgi_playlist

    d = tmp_path / "Model_"
    d.mkdir()
    names = ["Model_gen_2_1000.npz", "Model_gen_0_500.npz",
             "Model_initial.npz", "Model_gen_0_1000.npz",
             "Model_gen_10_500.npz"]
    for n in names:
        (d / n).write_bytes(b"")
    (d / "notes.txt").write_bytes(b"")  # non-npz ignored
    got = [os.path.basename(p)
           for p in mgi_playlist("Model", root=str(tmp_path))]
    assert got == ["Model_initial.npz", "Model_gen_0_500.npz",
                   "Model_gen_0_1000.npz", "Model_gen_2_1000.npz",
                   "Model_gen_10_500.npz"]
    assert mgi_playlist("NoSuchModel", root=str(tmp_path)) == []


def test_viewer_spawn_teardown(tmp_path):
    """cli --viewer spawns a watcher-viewer subprocess and tears it down
    on exit (scripts/ppo.py:261-276, 352-368) — exercised headless via
    the dummy SDL driver."""
    from madrona_basketball_tpu.cli import _spawn_viewer, _teardown_viewer

    log_folder = str(tmp_path / "logs")
    proc = _spawn_viewer(log_folder)
    assert proc is not None, "dummy SDL driver should allow spawning"
    try:
        assert proc.poll() is None  # alive, polling the empty folder
    finally:
        _teardown_viewer(proc)
    assert proc.poll() is not None


def test_viewer_spawn_headless_guard(tmp_path, monkeypatch):
    from madrona_basketball_tpu.cli import _spawn_viewer

    monkeypatch.delenv("DISPLAY", raising=False)
    monkeypatch.delenv("SDL_VIDEODRIVER", raising=False)
    assert _spawn_viewer(str(tmp_path / "logs")) is None


def test_viewer_embedded_tick():
    from madrona_basketball_tpu.viewer.app import ViewerClass

    cfg = SimConfig()
    env = BasketballEnv(4, cfg, seed=3)
    viewer = ViewerClass(sim_instance=env, training_mode=True, headless=True)
    env.viewer = viewer
    env.reset()
    import jax.numpy as jnp
    for _ in range(3):
        env.step(jnp.zeros((4, 6), jnp.int32))


def test_rules_controller():
    """HAS_BALL_IDX must point at the real hasBall slot in the live
    engine's obs layout: agent 0 spawns holding the ball in 1v1, agent 1
    does not, and the controller's branch must follow."""
    import jax as _jax

    from madrona_basketball_tpu.controllers import RulesController

    cfg = SimConfig()
    env = BasketballEnv(4, cfg, seed=4)
    env.reset()
    ctl = RulesController()
    obs_all = np.asarray(_jax.device_get(env.state.agents.obs))
    has_ball = np.asarray(_jax.device_get(env.state.agents.has_ball))
    for agent in range(2):
        obs = obs_all[0, agent]
        assert obs[ctl.HAS_BALL_IDX] == has_ball[0, agent], \
            f"agent {agent}: obs[{ctl.HAS_BALL_IDX}] is not hasBall"
        act = ctl.get_action(obs)
        assert act.shape == (6,)
        if has_ball[0, agent]:
            assert act[5] == 1 and act[3] == 0   # shoot
        else:
            assert act[3] == 1 and act[5] == 0   # grab


def test_infer_chunked_matches_perstep_schema(tmp_path):
    """Chunked eval (one dispatch per K steps, one fetch per chunk) and
    the per-step path must emit the same npz schema and both count
    completed episodes; with a short clock both finish episodes."""
    from madrona_basketball_tpu.infer import infer as _infer
    cfg = SimConfig(time_per_period=0.5)
    net, ap = init_agent(jax.random.PRNGKey(2))
    paths = {}
    for name, chunk in (("perstep", 1), ("chunked", 16)):
        path = str(tmp_path / f"{name}.npz")
        env = BasketballEnv(4, cfg, seed=3)
        counts = _infer(env, net, ap, log_path=path, num_episodes=1,
                        max_steps=64, stochastic=True, seed=0,
                        trainee_idx=1, chunk_size=chunk)
        assert (counts >= 1).all(), f"{name}: episodes not completed"
        paths[name] = dict(np.load(path, allow_pickle=True))
    a, b = paths["perstep"], paths["chunked"]
    assert set(a.keys()) == set(b.keys())
    for k in ("agent_pos", "game_state", "actions"):
        assert a[k].shape[1:] == b[k].shape[1:], k


def test_viewer_fading_trails_render(trajectory_npz):
    """Trail points render with per-point faded colors (reference
    scripts/viewer.py:962,1388-1390: older points darker by up to 50%)."""
    from madrona_basketball_tpu.viewer import constants as V
    from madrona_basketball_tpu.viewer.app import ViewerClass

    raw, episodes, _ = ViewerClass.load_and_parse_log(trajectory_npz)
    s0, s1 = episodes[0]
    t = s1 - 1
    ep_len = max(s1 - s0, 1)
    trails = []
    for a in range(raw["agent_pos"].shape[2]):
        base = V.TEAM0_COLOR if a % 2 == 0 else V.TEAM1_COLOR
        pts = raw["agent_pos"][s0:t + 1, 0, a, :2][::4]
        ages = (t - np.arange(s0, t + 1)[::4]) / ep_len
        cols = [tuple(int((1.0 - 0.5 * x) * c) for c in base)
                for x in ages]
        assert all(0 <= v <= 255 for c in cols for v in c)
        # oldest point strictly darker than newest when span > 0
        if len(cols) > 1:
            assert sum(cols[0]) < sum(cols[-1])
        trails.append((pts, cols))
    viewer = ViewerClass(headless=True)
    hp = np.asarray(raw["hoop_pos"]).reshape(-1, 3)
    viewer._draw_frame(raw["agent_pos"][t, 0], raw["orientation"][t, 0],
                       raw["ball_pos"][t, 0, 0], hp,
                       raw["game_state"][t, 0],
                       possession=raw["agent_possession"][t, 0],
                       trails=trails)
    viewer.pg.display.flip()
