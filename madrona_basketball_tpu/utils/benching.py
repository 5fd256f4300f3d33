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


def run_chunked_train(ts, chunk, iters, label, W, T, ch=100,
                      print_every=None):
    """Drive `chunk` (a make_train_chunk product: ts -> (ts, stacked
    metrics)) for `iters` iterations, printing reward/episode-length
    every `print_every` iterations (default: every chunk) and a final
    line with the finite-params check and sustained env-steps/s
    including compile.  The single chunked-run scaffold for the soak /
    ref-scale / evidence-driver scripts — a fix here reaches all of
    them identically.  Returns the final train state."""
    print_every = print_every or ch
    assert iters % ch == 0, f"iters={iters} must be a multiple of ch={ch}"
    assert print_every % ch == 0, \
        f"print_every={print_every} must be a multiple of ch={ch}"
    t0 = time.perf_counter()
    done = 0
    last = (0.0, 0.0)
    while done < iters:
        ts, st = chunk(ts)
        done += ch
        if done % print_every == 0 or done >= iters:
            r = float(np.asarray(jax.device_get(st["mean_reward"][-1])))
            ln = float(np.asarray(jax.device_get(
                st["mean_episode_length"][-1])))
            last = (r, ln)
            print(f"[{label}] iter {done}: reward {r:.1f} len {ln:.1f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    finite = all(np.isfinite(np.asarray(jax.device_get(x))).all()
                 for x in jax.tree.leaves(ts.agent.params))
    el = time.perf_counter() - t0
    fps = done * W * T / el
    print(f"[{label}] DONE {done} iters ({done * W * T / 1e9:.1f}B "
          f"env-steps) in {el:.0f}s wall reward {last[0]:.1f} len "
          f"{last[1]:.1f} params_finite={finite} "
          f"sustained {fps / 1e6:.1f}M steps/s incl. compile", flush=True)
    return ts
