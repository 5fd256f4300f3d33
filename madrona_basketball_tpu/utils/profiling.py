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


def honor_platform_env():
    """Re-assert JAX_PLATFORMS over site hooks.

    The deployment image installs a site hook that forces an `axon`
    (remote-TPU-tunnel) platform AFTER the environment variable is read,
    so `JAX_PLATFORMS=cpu python -m ...cli` would silently run on the
    tunnel.  The jax.config knob wins over the hook; calling this early
    in every CLI makes the env var mean what it says.  No-op when the
    variable is unset or the backend is already initialized."""
    import os
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        pass  # backend already initialized; too late to switch


def enable_compile_cache(path: str | None = None):
    """Turn on JAX's persistent compilation cache (repeat CLI runs skip
    the ~25 s train-iteration compile).  Honors JAX_COMPILATION_CACHE_DIR
    if already set; pass path=None for the default under ~/.cache."""
    import os
    if os.environ.get("JAX_COMPILATION_CACHE_DIR") or \
            jax.config.jax_compilation_cache_dir:
        return  # respect an existing env or programmatic setting
    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "madrona_basketball_tpu",
        "jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as e:
        import warnings
        warnings.warn(f"compile cache disabled ({e})", stacklevel=2)
        return
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
