"""Jitted policy evaluation.

Replaces the reference's host eval loops (one Python env stepped until
``num_eval_ep`` episodes finish, /root/reference/cleanmarl/vdn.py:357-393)
with a batch of ``num_eval_ep`` on-device envs scanned for
``episode_limit`` steps: each env contributes exactly its first episode
(reward accumulation stops at done|truncated), giving the same
"N independent eval episodes" statistics in one XLA program.

Emits the reference's ``eval/*`` scalar family: ep_reward, std_ep_reward,
ep_length, battle_won (vdn.py:385-393).
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import chex
import jax
import jax.numpy as jnp

from cleanmarl_tpu.envs.base import Environment, VecEnv

# policy(params, carry, obs, avail, key) -> (carry, actions)
PolicyFn = Callable[..., Any]


def make_evaluator(
    env: Environment,
    num_eval_ep: int,
    policy: PolicyFn,
    init_carry: Callable[[int], Any] = lambda n: (),
):
    """Returns eval_fn(params, key) -> dict of scalar metrics."""
    from cleanmarl_tpu.envs.external import as_vec

    vec = as_vec(env, num_eval_ep, auto_reset=False)

    def eval_fn(params, key: chex.PRNGKey):
        reset_key, key = jax.random.split(key)
        env_state, ts = vec.reset(reset_key)
        carry0 = init_carry(num_eval_ep)

        def step_fn(loop_state, _):
            env_state, ts, carry, active, ret, length, won, key = loop_state
            key, act_key, step_key = jax.random.split(key, 3)
            carry, actions = policy(params, carry, ts.obs, ts.avail, act_key)
            env_state, ts2, _ = vec.step(env_state, actions, step_key)
            ret = ret + ts2.reward * active
            length = length + active
            ended = jnp.logical_or(ts2.done, ts2.truncated)
            finished_now = jnp.logical_and(active, ended)
            won = jnp.where(
                finished_now,
                ts2.info.get("battle_won", jnp.zeros_like(ret)),
                won,
            )
            active = jnp.logical_and(active, jnp.logical_not(ended))
            return (env_state, ts2, carry, active, ret, length, won, key), None

        zeros = jnp.zeros((num_eval_ep,), jnp.float32)
        active0 = jnp.ones((num_eval_ep,), jnp.bool_)
        init = (env_state, ts, carry0, active0, zeros, zeros, zeros, key)
        (_, _, _, _, ret, length, won, _), _ = jax.lax.scan(
            step_fn, init, None, length=env.episode_limit
        )
        return {
            "eval/ep_reward": ret.mean(),
            "eval/std_ep_reward": ret.std(),
            "eval/ep_length": length.mean(),
            "eval/battle_won": won.mean(),
        }

    return eval_fn
