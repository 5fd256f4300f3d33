"""Device profiling helpers.

The reference's only tracing is wall-clock phase timers
(scripts/ppo_stats.py:53-150; see utils/timers.py for that port).  On TPU we
additionally expose `jax.profiler` traces (xprof/tensorboard-viewable) around
arbitrary sections.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mbtpu_profile"):
    """Capture a device trace: `with trace('logdir'): run_workload()`.
    View with TensorBoard's profile plugin or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the TraceViewer timeline)."""
    return jax.profiler.TraceAnnotation(name)
