"""Native C++ CPU executor vs the JAX row-path — triple-implementation
agreement (C++ / fused-XLA / structured engine, transitively through
tests/test_fused.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu import engine
from madrona_basketball_tpu.config import SimConfig
from madrona_basketball_tpu.ops import layout
from madrona_basketball_tpu.ops.fused_step import fused_step_xla

try:
    from madrona_basketball_tpu.native import NativeEngine, build_library
    build_library()
    HAVE_NATIVE = True
except Exception as e:  # pragma: no cover - toolchain missing
    HAVE_NATIVE = False
    _err = e

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native toolchain unavailable")

W = 16


def _rand_noise(rng, w):
    n = np.empty((layout.N_NOISE_ROWS, w), np.float32)
    n[:8] = rng.uniform(-1, 1, (8, w))
    n[8] = rng.uniform(0, 1, w)
    return n


@pytest.mark.parametrize("cfg", [
    SimConfig(one_on_one=True, tag_mode=True),
    SimConfig(one_on_one=False, tag_mode=False),
])
def test_native_matches_fused_xla(cfg):
    rng = np.random.RandomState(0)
    init = jax.vmap(lambda k: engine.generate_world(cfg, k))(
        jax.random.split(jax.random.PRNGKey(2), W))
    eng = NativeEngine(cfg, W, init_state=init)
    sf = jnp.asarray(eng.sf.copy())
    si = jnp.asarray(eng.si.copy())

    pack = jax.jit(layout.pack)
    for t in range(50):
        acts = rng.randint(0, [2, 8, 3, 2, 2, 2],
                           size=(W, C.NUM_AGENTS, 6)).astype(np.int32)
        eng.set_actions(acts)
        sf_np = eng.sf.copy()
        si_np = eng.si.copy()
        noise = _rand_noise(rng, W)

        eng.step(noise)
        sf2, si2, obs2 = fused_step_xla(cfg, jnp.asarray(sf_np),
                                        jnp.asarray(si_np),
                                        jnp.asarray(noise))

        # Integers exact.
        np.testing.assert_array_equal(
            eng.si, np.asarray(si2), err_msg=f"step {t}: si mismatch")
        # Floats: C++ libm vs XLA transcendental differences; the native
        # path also uses true atan2/acos where the TPU path uses the
        # algebraic forms — tolerance covers both.
        sf_got, sf_want = eng.sf, np.asarray(sf2)
        quat_rows = [layout.F_IDX[f"a{i}.quat_{c}"] for i in range(2)
                     for c in "wxyz"]
        mask = np.ones(layout.N_F32_ROWS, bool)
        mask[quat_rows] = False
        np.testing.assert_allclose(sf_got[mask], sf_want[mask], atol=5e-4,
                                   rtol=1e-3,
                                   err_msg=f"step {t}: sf mismatch")
        # Quats may differ in sign (same rotation); compare |q|.
        np.testing.assert_allclose(np.abs(sf_got[quat_rows]),
                                   np.abs(sf_want[quat_rows]), atol=5e-4,
                                   err_msg=f"step {t}: quat mismatch")
        obs_got, obs_want = eng.obs, np.asarray(obs2)
        close = np.allclose(obs_got, obs_want, atol=5e-4, rtol=1e-3)
        close_abs = np.allclose(np.abs(obs_got), np.abs(obs_want),
                                atol=5e-4, rtol=1e-3)
        assert close or close_abs, \
            f"step {t}: obs mismatch {np.abs(obs_got - obs_want).max()}"

        # Resync both sides to the native state to prevent drift.
        sf = jnp.asarray(eng.sf.copy())
        si = jnp.asarray(eng.si.copy())


def test_native_throughput_smoke():
    cfg = SimConfig()
    eng = NativeEngine(cfg, 1024, seed=1)
    import time
    eng.step()
    t0 = time.perf_counter()
    for _ in range(20):
        eng.step()
    dt = (time.perf_counter() - t0) / 20
    fps = 1024 / dt
    print(f"native CPU: {fps:,.0f} steps/s")
    assert fps > 50_000  # very conservative floor
