"""Viewer CLI — `python -m madrona_basketball_tpu.viewer [...]`.

Mirrors the reference CLI (scripts/viewer.py:1517-1531):
  --playback-log PATH[,PATH...]   play recorded trajectory npz file(s)
  --live-log-folder DIR           watch a training run's log drops
  --watch-model NAME              shorthand for --live-log-folder logs/NAME
"""

import argparse
import glob


def main(argv=None):
    p = argparse.ArgumentParser(description="Trajectory viewer")
    p.add_argument("--playback-log", type=str, default=None)
    p.add_argument("--live-log-folder", type=str, default=None)
    p.add_argument("--watch-model", type=str, default=None)
    args = p.parse_args(argv)

    from .app import ViewerClass
    viewer = ViewerClass()

    if args.playback_log:
        paths = []
        for part in args.playback_log.split(","):
            paths.extend(sorted(glob.glob(part)) or [part])
        viewer.run_trajectory_playback(paths)
    elif args.live_log_folder:
        viewer.watch_training(args.live_log_folder)
    elif args.watch_model:
        viewer.watch_training(f"logs/{args.watch_model}")
    else:
        p.error("one of --playback-log / --live-log-folder / --watch-model "
                "is required")


if __name__ == "__main__":
    main()
