"""On-device action selection.

ε-greedy mirrors the reference's host-side branch
(/root/reference/cleanmarl/vdn.py:269-277): with prob ε take a uniform
avail-masked random action (env.sample semantics,
smaclite_wrapper.py:49-54), else the avail-masked argmax of Q. Here the
coin flip is per-env and fully on-device (no Python branch), vectorized
over (num_envs, n_agents).
"""
from __future__ import annotations

import chex
import jax
import jax.numpy as jnp


def masked_argmax(q: chex.Array, avail: chex.Array) -> chex.Array:
    """Greedy actions over available ones. q (..., A), avail (..., A)."""
    return jnp.argmax(jnp.where(avail.astype(bool), q, -jnp.inf), axis=-1).astype(
        jnp.int32
    )


def masked_uniform(key: chex.PRNGKey, avail: chex.Array) -> chex.Array:
    """Uniform sample over available actions. avail (..., A) → (...)."""
    logits = jnp.where(avail.astype(bool), 0.0, -jnp.inf)
    return jax.random.categorical(key, logits).astype(jnp.int32)


def eps_greedy(
    key: chex.PRNGKey,
    q: chex.Array,
    avail: chex.Array,
    epsilon: chex.Array,
) -> chex.Array:
    """q, avail: (num_envs, n_agents, A). One ε-coin per env (the
    reference explores all agents of an env together, vdn.py:269-271)."""
    num_envs = q.shape[0]
    coin_key, unif_key = jax.random.split(key)
    explore = jax.random.uniform(coin_key, (num_envs,)) < epsilon
    random_actions = masked_uniform(unif_key, avail)
    greedy_actions = masked_argmax(q, avail)
    return jnp.where(explore[:, None], random_actions, greedy_actions)
