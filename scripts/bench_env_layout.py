"""Measure batch-major vs batch-minor env vmapping on the TPU.

The round-3 profile shows the rollout floor is the env-step chain
(~3 ms per vectorized step at 8192 envs), and its kernels run on
(B, 3)/(B, 3, 3) tensors whose tiny trailing dims occupy 3 of 128
lanes (~2% VPU lane utilization). Vmapping the env over the TRAILING
axis instead (out_axes=-1) puts the env batch in the lanes.

This times a 60-step random-policy rollout both ways; the batch-minor
variant pays a per-step transpose of obs/avail back to batch-major
(what the networks consume) so the comparison is end-to-end fair.
"""
import json
import time

import jax
import jax.numpy as jnp


def main():
    from cleanmarl_tpu.envs import registry

    env = registry.make("smaclite", "3m", agent_ids=True)
    N = 8192
    T = 60
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, N)

    step_f = jax.vmap(env.step)
    step_l = jax.vmap(env.step, in_axes=(-1, 0, 0), out_axes=-1)

    @jax.jit
    def roll_first(state, obs_avail, key):
        def body(c, _):
            st, (obs, avail), k = c
            k, ka, ks = jax.random.split(k, 3)
            acts = jax.random.categorical(
                ka, jnp.where(avail, 0.0, -1e9)
            ).astype(jnp.int32)
            st, ts = step_f(st, acts, jax.random.split(ks, N))
            return (st, (ts.obs, ts.avail), k), ts.reward
        c, r = jax.lax.scan(body, (state, obs_avail, key), None, length=T)
        return r.sum()

    @jax.jit
    def roll_last(state, obs_avail, key):
        def body(c, _):
            st, (obs, avail), k = c          # obs (N,n,d), avail (N,n,A)
            k, ka, ks = jax.random.split(k, 3)
            acts = jax.random.categorical(
                ka, jnp.where(avail, 0.0, -1e9)
            ).astype(jnp.int32)
            st, ts = step_l(st, acts, jax.random.split(ks, N))
            # networks consume batch-major, features-last
            obs2 = jnp.moveaxis(ts.obs, -1, 0)
            avail2 = jnp.moveaxis(ts.avail, -1, 0)
            return (st, (obs2, avail2), k), ts.reward
        c, r = jax.lax.scan(body, (state, obs_avail, key), None, length=T)
        return r.sum()

    sf, tsf = jax.vmap(env.reset)(keys)
    sl, tsl = jax.vmap(env.reset, in_axes=0, out_axes=-1)(keys)
    obs_l = jnp.moveaxis(tsl.obs, -1, 0)
    avail_l = jnp.moveaxis(tsl.avail, -1, 0)

    for name, fn, args in [
        ("batch_major", roll_first, (sf, (tsf.obs, tsf.avail), key)),
        ("batch_minor", roll_last, (sl, (obs_l, avail_l), key)),
    ]:
        float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(5):
            float(fn(*args))
        print(json.dumps(
            {name + "_s_per_rollout": round((time.perf_counter() - t0) / 5, 4)}
        ))


if __name__ == "__main__":
    main()
