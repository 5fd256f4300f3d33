"""Native CPU batch executor bindings.

Builds (on demand, via g++) and wraps native/mbb_sim.cpp — the multithreaded
C++ implementation of the step chain over the same flat row layout as the
fused TPU kernel.  The TPU-native counterpart of the reference's CPU
TaskGraphExecutor path (src/mgr.cpp:49-81), bound through ctypes (no
pybind11 in this image).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_THIS = os.path.dirname(os.path.abspath(__file__))
_SRC_DIR = os.path.join(_THIS, "..", "..", "native")
_LIB_PATH = os.path.join(_SRC_DIR, "libmbb_sim.so")


def build_library(force: bool = False) -> str:
    src = os.path.join(_SRC_DIR, "mbb_sim.cpp")
    header = os.path.join(_SRC_DIR, "layout_generated.h")
    gen = os.path.join(_SRC_DIR, "gen_layout_header.py")
    if force or not os.path.exists(header) or \
            os.path.getmtime(header) < os.path.getmtime(gen):
        subprocess.run(["python", gen, header], check=True)
    if force or not os.path.exists(_LIB_PATH) or \
            os.path.getmtime(_LIB_PATH) < max(os.path.getmtime(src),
                                              os.path.getmtime(header)):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
             "-fPIC", "-o", _LIB_PATH, src, "-lpthread"],
            check=True, cwd=_SRC_DIR)
    return _LIB_PATH


_lib = None


def load_library():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build_library())
        lib.mbb_step.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_float, ctypes.c_float, ctypes.c_float,
            ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.mbb_step.restype = None
        for fn in ("mbb_n_f32_rows", "mbb_n_i32_rows", "mbb_n_obs_rows",
                   "mbb_n_noise_rows"):
            getattr(lib, fn).restype = ctypes.c_int32
        _lib = lib
    return _lib


class NativeEngine:
    """CPU multi-world executor over numpy row matrices (in-place step)."""

    def __init__(self, cfg, num_worlds: int, seed: int = 0,
                 n_threads: int = 0, init_state=None):
        import jax

        from .. import engine
        from ..ops import layout

        self.cfg = cfg
        self.num_worlds = num_worlds
        self.lib = load_library()
        assert self.lib.mbb_n_f32_rows() == layout.N_F32_ROWS, \
            "layout drift: regenerate native/layout_generated.h"
        assert self.lib.mbb_n_i32_rows() == layout.N_I32_ROWS

        if init_state is None:
            init_state = engine.init_batch(cfg, jax.random.PRNGKey(seed),
                                           num_worlds)
        sf, si = layout.pack(init_state)
        # force writable owned copies — np.asarray over a jax.Array gives a
        # read-only view and ascontiguousarray won't copy if already packed
        self.sf = np.array(sf, np.float32, order="C")
        self.si = np.array(si, np.int32, order="C")
        self.obs = np.zeros((layout.N_OBS_ROWS, num_worlds), np.float32)
        self.n_threads = n_threads or (os.cpu_count() or 1)
        self.rng = np.random.RandomState(seed)

    def draw_noise(self) -> np.ndarray:
        from ..ops import layout
        W = self.num_worlds
        n = np.empty((layout.N_NOISE_ROWS, W), np.float32)
        n[:6] = self.rng.uniform(-1, 1, (6, W))
        n[6] = self.rng.uniform(-1, 1, W)
        n[7] = self.rng.uniform(-1, 1, W)
        n[8] = self.rng.uniform(0, 1, W)
        return n

    def step(self, noise: np.ndarray | None = None):
        if noise is None:
            noise = self.draw_noise()
        noise = np.ascontiguousarray(noise, np.float32)
        cfg = self.cfg
        self.lib.mbb_step(
            self.sf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.si.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            noise.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.obs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.num_worlds, cfg.grid_width, cfg.grid_height, cfg.start_x,
            cfg.start_y, cfg.time_per_period, cfg.shot_clock_duration,
            1 if cfg.tag_mode else 0, self.n_threads)

    def set_actions(self, actions: np.ndarray):
        from .. import constants as C
        from ..ops import layout
        actions = np.asarray(actions, np.int32)
        for i in range(C.NUM_AGENTS):
            for j, name in enumerate(("a_move", "a_angle", "a_rotate",
                                      "a_grab", "a_pass", "a_shoot")):
                self.si[layout.I_IDX[f"a{i}.{name}"]] = actions[:, i, j]

    def state(self):
        import jax
        import jax.numpy as jnp

        from ..ops import layout
        keys = jax.random.split(jax.random.PRNGKey(0), self.num_worlds)
        return layout.unpack(self.cfg, jnp.asarray(self.sf),
                             jnp.asarray(self.si), keys,
                             obs=jnp.asarray(self.obs))
