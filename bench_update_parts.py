"""Decompose the minibatch-update phase: shuffle gathers vs grad steps.
Usage: python bench_update_parts.py [num_envs]"""
import sys
import jax, jax.numpy as jnp

from madrona_basketball_tpu.utils.benching import bench_ms as bench

def main():
    from madrona_basketball_tpu.utils.profiling import enable_compile_cache
    enable_compile_cache()
    from madrona_basketball_tpu.models.agent import init_agent
    from madrona_basketball_tpu.ppo.hparams import PPOParams
    from madrona_basketball_tpu.ppo.train import (make_minibatch_update,
                                                  make_optimizer,
                                                  make_update_fns)

    W = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    hp = PPOParams(num_envs=W)
    total = hp.rollout_batch_size
    net, _ = init_agent(jax.random.PRNGKey(0))
    _, ap = init_agent(jax.random.PRNGKey(1))
    tx = make_optimizer(hp)
    opt_state = tx.init(ap.params)
    rng = jax.random.PRNGKey(2)
    T, N = hp.num_rollout_steps, hp.num_envs
    buf = dict(obs=jax.random.normal(rng, (T, N, 128)),
               actions=jax.random.randint(rng, (T, N, 6), 0, 2),
               log_probs=jax.random.normal(rng, (T, N)) * 0.1,
               values=jax.random.normal(rng, (T, N)),
               rewards=jax.random.normal(rng, (T, N)),
               not_dones=jnp.ones((T, N)),
               next_value=jax.random.normal(rng, (N,)))
    adv = jax.random.normal(rng, (T, N)); vn = adv * 0.5; rn = adv * 0.3
    key = jax.random.PRNGKey(3)

    _, up = make_update_fns(hp, net)
    up = jax.jit(up)
    t_full = bench(up, (ap, opt_state, buf, adv, vn, rn, key))

    # shuffle-only: the feat build + per-epoch permute-gather + reshape
    G = hp.shuffle_block
    F32 = jnp.float32
    @jax.jit
    def shuffle_only(buf, adv, vn, rn, key):
        obs = buf["obs"].reshape(total, -1)
        feat = jnp.concatenate([
            obs, buf["actions"].reshape(total, 6).astype(F32),
            buf["log_probs"].reshape(total, 1), vn.reshape(total, 1),
            adv.reshape(total, 1), rn.reshape(total, 1)], axis=-1)
        Fdim = feat.shape[-1]
        featG = feat.reshape(total // G, G, Fdim)
        acc = jnp.zeros((), F32)
        def epoch(carry, ekey):
            perm = jax.random.permutation(ekey, total // G)
            fe = featG[perm]
            return carry + fe[0, 0, 0], None
        acc, _ = jax.lax.scan(epoch, acc, jax.random.split(key, hp.update_epochs))
        return acc
    t_shuf = bench(shuffle_only, (buf, adv, vn, rn, key))

    # grad-steps-only: same minibatch scan, identity order (no permutation)
    from madrona_basketball_tpu.ppo.train import make_minibatch_update
    import optax
    from madrona_basketball_tpu.models import agent as agent_lib
    def loss_fn(params, agent, o, a, lp, v, advb, ret):
        lp_, ent, v_ = agent_lib.get_stats(net, agent.replace(params=params), o, a)
        ratio = jnp.exp(lp_ - lp)
        pg = jnp.maximum(-advb * ratio, -advb * jnp.clip(ratio, 0.8, 1.2)).mean()
        return pg + 0.5 * ((v_ - ret) ** 2).mean() - 0.01 * ent.mean()
    gf = jax.grad(loss_fn)
    @jax.jit
    def grads_only(ap, opt_state, buf, adv, vn, rn):
        obs = buf["obs"].reshape(total, -1)
        feat = jnp.concatenate([
            obs, buf["actions"].reshape(total, 6).astype(F32),
            buf["log_probs"].reshape(total, 1), vn.reshape(total, 1),
            adv.reshape(total, 1), rn.reshape(total, 1)], axis=-1)
        Fdim = feat.shape[-1]
        def epoch(carry, _):
            fe_all = feat.reshape(hp.num_minibatches, hp.minibatch_size, Fdim)
            def mb(carry, fe):
                params, os_ = carry
                o = fe[:, :128]; a = fe[:, 128:134].astype(jnp.int32)
                g = gf(params, ap, o, a, fe[:, 134], fe[:, 135], fe[:, 136], fe[:, 137])
                u, os_ = tx.update(g, os_, params)
                return (optax.apply_updates(params, u), os_), None
            carry, _ = jax.lax.scan(mb, carry, fe_all)
            return carry, None
        (params, os_), _ = jax.lax.scan(epoch, (ap.params, opt_state), None, length=hp.update_epochs)
        return params
    t_grad = bench(grads_only, (ap, opt_state, buf, adv, vn, rn))

    print(f"W={W} G={G}: full_update={t_full:.2f} ms  shuffle_only={t_shuf:.2f} ms  grad_steps_only={t_grad:.2f} ms")

if __name__ == "__main__":
    main()
