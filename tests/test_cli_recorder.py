"""EpisodeRecorder: host-side assembly of world-0 logs into episode npz."""

import numpy as np

from madrona_basketball_tpu.cli import EpisodeRecorder


def _w0(T, done_at=None):
    done = np.zeros((T, 1), np.float32)
    if done_at is not None:
        done[done_at, 0] = 1.0
    return {
        "agent_pos": np.random.rand(T, 1, 2, 3).astype(np.float32),
        "ball_pos": np.random.rand(T, 1, 1, 3).astype(np.float32),
        "ball_vel": np.zeros((T, 1, 1, 3), np.float32),
        "orientation": np.zeros((T, 1, 2, 4), np.float32),
        "ball_physics": np.zeros((T, 1, 1, 7), np.int32),
        "agent_possession": np.zeros((T, 1, 2, 3), np.int32),
        "game_state": np.zeros((T, 1, 14), np.float32),
        "rewards": np.zeros((T, 1, 2), np.float32),
        "actions": np.zeros((T, 1, 2, 6), np.int32),
        "done": done,
    }


def test_recorder_waits_for_boundary_then_records(tmp_path):
    hoop_pos = np.zeros((1, 2, 3), np.float32)
    rec = EpisodeRecorder(str(tmp_path), hoop_pos, every_n=10)
    rec.maybe_arm(10)
    assert rec.waiting

    # Rollout 1: episode boundary at t=5 -> recording starts after it.
    rec.feed(_w0(8, done_at=5), iteration=10)
    assert rec.recording and not rec.waiting
    assert len(rec.steps) == 2  # steps 6, 7 recorded

    # Rollout 2: boundary at t=3 closes the episode and saves.
    rec.feed(_w0(8, done_at=3), iteration=11)
    assert not rec.recording
    files = list(tmp_path.iterdir())
    assert len(files) == 1 and files[0].name == "iter_11_episode.npz"
    data = dict(np.load(files[0]))
    # 2 steps from rollout 1 + 4 steps (t=0..3) from rollout 2.
    assert data["agent_pos"].shape == (6, 1, 2, 3)
    assert data["hoop_pos"].shape == (1, 2, 3)


def test_recorder_idle_without_arm(tmp_path):
    rec = EpisodeRecorder(str(tmp_path),
                          np.zeros((1, 2, 3), np.float32), every_n=10)
    rec.feed(_w0(8, done_at=2), iteration=3)
    assert not rec.recording and not rec.waiting
    assert list(tmp_path.iterdir()) == []
