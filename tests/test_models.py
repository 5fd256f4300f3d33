"""Model-stack tests: normalizers, action distributions, network init, GAE."""

import jax
import jax.numpy as jnp
import numpy as np

from madrona_basketball_tpu import constants as C
from madrona_basketball_tpu.models import action as action_dist
from madrona_basketball_tpu.models.agent import (evaluate, forward, get_stats,
                                                 init_agent)
from madrona_basketball_tpu.models.normalize import (rms_init, rms_normalize,
                                                     rms_unnormalize,
                                                     rms_update)
from madrona_basketball_tpu.ops.gae import compute_gae

BUCKETS = C.ACTION_BUCKETS


# ---------------------------------------------------------------- normalizer

def _reference_rms_f64(batches):
    """Float64 replica of the reference merge (scripts/agent.py:40-50)."""
    mean = np.zeros(batches[0].shape[-1])
    var = np.ones(batches[0].shape[-1])
    count = 1.0
    for x in batches:
        x = x.reshape(-1, x.shape[-1]).astype(np.float64)
        b_mean = x.mean(axis=0)
        b_var = x.var(axis=0, ddof=1)
        n = x.shape[0]
        count_ = n + count
        delta = b_mean - mean
        m = var * count + b_var * n + delta**2 * count * n / count_
        mean = mean + delta * n / count_
        var = m / count_
        count = count_
    return mean, var, count


def test_rms_matches_reference_merge():
    rng = np.random.RandomState(0)
    batches = [rng.randn(64, 8).astype(np.float32) * (i + 1) + i
               for i in range(20)]
    st = rms_init(8)
    for b in batches:
        st = rms_update(st, jnp.asarray(b))
    mean64, var64, count64 = _reference_rms_f64(batches)
    np.testing.assert_allclose(np.asarray(st.mean), mean64, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(st.var), var64, rtol=1e-3,
                               atol=1e-3)
    assert float(st.count) == count64


def test_rms_normalize_roundtrip():
    st = rms_init(4)
    st = st.replace(mean=jnp.array([1.0, 2.0, 3.0, 4.0]),
                    var=jnp.array([4.0, 1.0, 9.0, 0.25]))
    x = jnp.array([[2.0, 2.5, 0.0, 4.5]])
    n = rms_normalize(st, x, clamp=5.0)
    back = rms_unnormalize(st, n, clamp=5.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4,
                               atol=1e-5)


def test_rms_clamp():
    st = rms_init(1)
    x = jnp.array([[1000.0]])
    n = rms_normalize(st, x, clamp=5.0)
    assert float(n[0, 0]) == 5.0


# ---------------------------------------------------------------- actions

def test_action_log_probs_match_softmax():
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(16, sum(BUCKETS)).astype(np.float32))
    actions = jnp.asarray(
        np.stack([rng.randint(0, n, 16) for n in BUCKETS], axis=1))
    lps, ents = action_dist.action_stats(logits, actions, BUCKETS)
    off = 0
    for i, n in enumerate(BUCKETS):
        lg = np.asarray(logits[:, off:off + n], np.float64)
        p = np.exp(lg - lg.max(axis=1, keepdims=True))
        p /= p.sum(axis=1, keepdims=True)
        want_lp = np.log(p[np.arange(16), np.asarray(actions[:, i])])
        want_ent = -(p * np.log(p)).sum(axis=1)
        np.testing.assert_allclose(np.asarray(lps[:, i]), want_lp, atol=2e-4)
        np.testing.assert_allclose(np.asarray(ents[:, i]), want_ent,
                                   atol=2e-4)
        off += n


def test_action_sampling_respects_buckets_and_distribution():
    key = jax.random.PRNGKey(0)
    n_samp = 4000
    logits = jnp.tile(jnp.asarray(
        [[2.0, 0.0] + [0.0] * (sum(BUCKETS) - 2)], jnp.float32),
        (n_samp, 1))
    actions, lps = action_dist.sample(key, logits, BUCKETS)
    acts = np.asarray(actions)
    for i, n in enumerate(BUCKETS):
        assert acts[:, i].min() >= 0 and acts[:, i].max() < n
    # First bucket has p(a=0) = sigmoid(2) ~ 0.88.
    frac = (acts[:, 0] == 0).mean()
    assert 0.84 < frac < 0.92, frac
    assert lps.shape == (n_samp, len(BUCKETS))


def test_best_is_argmax():
    logits = jnp.zeros((2, sum(BUCKETS)), jnp.float32)
    logits = logits.at[0, 1].set(3.0)        # bucket 0 -> action 1
    logits = logits.at[1, 2 + 5].set(3.0)    # bucket 1 -> action 5
    best = np.asarray(action_dist.best(logits, BUCKETS))
    assert best[0, 0] == 1
    assert best[1, 1] == 5


# ---------------------------------------------------------------- network

def test_agent_init_statistics():
    net, ap = init_agent(jax.random.PRNGKey(3))
    leaves = {"/".join(map(str, path)): leaf for path, leaf in
              jax.tree_util.tree_flatten_with_path(ap.params)[0]}
    kernels = [np.asarray(v) for k, v in leaves.items() if "kernel" in k]
    # backbone first layer: fan_in=128 -> std = sqrt(2/3/128) (the
    # reference's kaiming-with-gain-as-slope quirk, scripts/agent.py:98)
    backbone = [k for k in kernels if k.shape[0] == C.OBS_SIZE][0]
    expected = np.sqrt(2.0 / 3.0 / C.OBS_SIZE)
    assert abs(backbone.std() - expected) / expected < 0.25
    # heads: orthogonal with gain 0.01 -> columns ~ norm 0.01
    head = [k for k in kernels if k.shape[1] == sum(BUCKETS)][0]
    col_norms = np.linalg.norm(head, axis=0)
    np.testing.assert_allclose(col_norms, 0.01, rtol=1e-3)


def test_forward_shapes_and_determinism():
    net, ap = init_agent(jax.random.PRNGKey(4))
    obs = jnp.asarray(np.random.RandomState(0).randn(32, C.OBS_SIZE),
                      jnp.float32)
    actions, lp, v = forward(net, ap, obs, jax.random.PRNGKey(5))
    assert actions.shape == (32, 6) and lp.shape == (32,) and v.shape == (32,)
    a2, lp2, v2 = forward(net, ap, obs, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(actions), np.asarray(a2))
    # deterministic mode ignores the key
    d1 = forward(net, ap, obs, jax.random.PRNGKey(1), stochastic=False)[0]
    d2 = forward(net, ap, obs, jax.random.PRNGKey(2), stochastic=False)[0]
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    # evaluate == critic head of forward
    np.testing.assert_allclose(np.asarray(evaluate(net, ap, obs)),
                               np.asarray(v), atol=1e-6)
    # get_stats log-probs agree with sampled log-probs
    lp3, ent, v3 = get_stats(net, ap, obs, actions)
    np.testing.assert_allclose(np.asarray(lp3), np.asarray(lp), atol=1e-5)


# ---------------------------------------------------------------- GAE

def test_gae_matches_reference_loop():
    rng = np.random.RandomState(7)
    T, N = 32, 16
    rewards = rng.randn(T, N).astype(np.float32)
    values = rng.randn(T, N).astype(np.float32)
    not_dones = (rng.rand(T, N) > 0.1).astype(np.float32)
    next_value = rng.randn(N).astype(np.float32)
    gamma, lam = 0.998, 0.95

    # Reference reversed loop (scripts/ppo.py:152-166).
    adv = np.zeros((T, N), np.float64)
    last = 0.0
    for t in reversed(range(T)):
        if t == T - 1:
            nnt, nv = not_dones[t], next_value
        else:
            nnt, nv = not_dones[t + 1], values[t + 1]
        delta = rewards[t] + gamma * nv * nnt - values[t]
        last = delta + gamma * lam * nnt * last
        adv[t] = last
    ret = adv + values

    a, r = compute_gae(jnp.asarray(rewards), jnp.asarray(values),
                       jnp.asarray(not_dones), jnp.asarray(next_value),
                       gamma, lam)
    np.testing.assert_allclose(np.asarray(a), adv, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(r), ret, rtol=1e-4, atol=1e-4)


def test_rms_long_horizon_drift_vs_f64():
    """Normalizer drift audit (VERDICT round-1 item 7): 5k nonstationary
    batch merges in f32 vs the reference's f64 Chan merge
    (scripts/agent.py:40-50).  Measured drift at count ~2.6e6 is ~3e-6
    relative; bound it with margin.  Beyond count ~1e9 the per-batch
    mean increment (delta * n / count) falls below the f32 ulp of the
    mean itself, so BOTH stacks' normalizers are effectively frozen
    late in training — f32 state loses no meaningful adaptation."""
    import jax

    from madrona_basketball_tpu.models.normalize import rms_init, rms_update

    dim, B, steps = 4, 512, 5000
    rng = np.random.RandomState(3)
    st32 = rms_init(dim)
    m64 = np.zeros(dim)
    v64 = np.ones(dim)
    c64 = 1.0
    upd = jax.jit(rms_update)
    for t in range(steps):
        mu = 3.0 * np.sin(t / 300.0) + 0.001 * t
        sd = 1.0 + 0.5 * np.cos(t / 500.0)
        x = rng.normal(mu, sd, (B, dim))
        st32 = upd(st32, jnp.asarray(x, jnp.float32))
        bm, bv = x.mean(0), x.var(0, ddof=1)
        tot = c64 + B
        d = bm - m64
        m = v64 * c64 + bv * B + d ** 2 * c64 * B / tot
        m64, v64, c64 = m64 + d * B / tot, m / tot, tot
    rel_mean = np.max(np.abs(np.asarray(st32.mean) - m64) /
                      np.maximum(np.abs(m64), 1e-8))
    rel_var = np.max(np.abs(np.asarray(st32.var) - v64) /
                     np.maximum(v64, 1e-8))
    assert rel_mean < 1e-4, f"mean drift {rel_mean:.2e}"
    assert rel_var < 1e-4, f"var drift {rel_var:.2e}"
    np.testing.assert_allclose(float(st32.count), c64, rtol=1e-6)
