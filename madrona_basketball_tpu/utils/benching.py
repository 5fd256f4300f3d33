"""Shared device-timing helper for the bench scripts.

`block_until_ready` can under-sync through the axon tunnel, so the
timing discipline (CLAUDE.md) is: chain `reps` launches, then sync by
FETCHING one scalar of the result, best of `tries`.  Hoisted here so a
fix to the sync pattern reaches every bench identically.
"""

import time

import jax
import numpy as np


def fetch_sync(out):
    """Synchronize by fetching one scalar of the first output leaf."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf.reshape(-1)[:1]))


def bench_ms(fn, args, reps=20, tries=3, fetch=fetch_sync):
    """Best-of-`tries` mean wall-time of `reps` chained `fn(*args)`
    launches, fetch-synced; returns milliseconds per launch."""
    out = fn(*args)
    fetch(out)
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        fetch(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3
