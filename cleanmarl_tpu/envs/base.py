"""Pure-JAX environment API — the TPU-native replacement for the
reference's ``CommonInterface`` ABC
(/root/reference/cleanmarl/env/common_interface.py:5-23).

The reference exposes a *stateful host object* with 9 methods
(step/reset/get_avail_actions/get_action_size/get_state/get_state_size/
get_obs_size/close/sample). Here the same contract becomes two pure
functions over an explicit ``EnvState`` pytree, so an env batch can be
``vmap``-ped and the whole rollout ``lax.scan``-ned into one XLA program:

    state, ts = env.reset(key)
    state, ts = env.step(state, actions, key)

Static metadata (obs_size/state_size/action_size/n_agents/episode_limit)
are plain Python attributes — they parameterize trace-time shapes.
``sample`` (uniform avail-masked random actions, cf.
/root/reference/cleanmarl/env/smaclite_wrapper.py:49-54) is provided
generically from the avail mask.
"""
from __future__ import annotations

import functools
from typing import Tuple

import chex
import jax
import jax.numpy as jnp

from cleanmarl_tpu.types import TimeStep


class Environment:
    """Base class for pure-JAX multi-agent environments.

    Subclasses define ``n_agents``, ``obs_dim``, ``state_dim``,
    ``n_actions``, ``episode_limit`` and implement ``_reset`` and
    ``_step`` as pure functions. ``EnvState`` must be a pytree whose
    last field ``t`` counts steps for the built-in TimeLimit (mirrors
    the reference's gymnasium TimeLimit(150),
    /root/reference/cleanmarl/env/smaclite_wrapper.py:14-15).

    **Action-index contract**: in envs with a death mechanic, action
    index 0 is the no-op and a dead agent's avail mask is exactly
    {no-op} (SMAC convention). ``alive_mask`` in the PPO family
    (``ppo_common.alive_mask``, the ``--death_masking`` lever) relies
    on this; an env that uses index 0 for a real action must keep
    ≥2 actions available for living agents (all in-tree envs do).
    """

    n_agents: int
    obs_dim: int
    state_dim: int
    n_actions: int
    episode_limit: int = 150

    # ---- to implement -------------------------------------------------
    def _reset(self, key: chex.PRNGKey):
        raise NotImplementedError

    def _step(self, state, actions: chex.Array, key: chex.PRNGKey):
        raise NotImplementedError

    # ---- public API ---------------------------------------------------
    def reset(self, key: chex.PRNGKey) -> Tuple[chex.ArrayTree, TimeStep]:
        return self._reset(key)

    def step(self, state, actions, key) -> Tuple[chex.ArrayTree, TimeStep]:
        return self._step(state, actions, key)

    def sample(self, key: chex.PRNGKey, avail: chex.Array) -> chex.Array:
        """Uniform random actions over available ones; per-agent.

        avail: (n_agents, n_actions) bool/int → (n_agents,) int32.
        """
        logits = jnp.where(avail.astype(bool), 0.0, -jnp.inf)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    # convenience accessors keeping the reference's names alive
    def get_obs_size(self) -> int:
        return self.obs_dim

    def get_state_size(self) -> int:
        return self.state_dim

    def get_action_size(self) -> int:
        return self.n_actions


class VecEnv:
    """A batch of identical envs, vmapped — the TPU-native replacement for
    the reference's Pipe/Process env workers
    (/root/reference/cleanmarl/vdn_multienvs.py:229-297).

    ``step`` auto-resets finished envs on-device (lockstep + auto-reset,
    cf. vdn_multienvs.py:389-423): when an env reports done|truncated its
    next observation comes from a fresh reset, while the returned
    ``TimeStep`` keeps the *terminal* reward/done/info so that training
    sees the true episode boundary. The pre-reset ("final") obs/state/
    avail are returned alongside for correct TD bootstrapping on
    truncation.
    """

    def __init__(self, env: Environment, num_envs: int, auto_reset: bool = True):
        self.env = env
        self.num_envs = num_envs
        self.auto_reset = auto_reset
        self.n_agents = env.n_agents
        self.obs_dim = env.obs_dim
        self.state_dim = env.state_dim
        self.n_actions = env.n_actions
        self.episode_limit = env.episode_limit
        self._reset_v = jax.vmap(env.reset)
        self._step_v = jax.vmap(env.step)

    def reset(self, key: chex.PRNGKey):
        keys = jax.random.split(key, self.num_envs)
        return self._reset_v(keys)

    def step(self, state, actions, key):
        """actions: (num_envs, n_agents) int32.

        Returns (new_state, ts, final) where ``final`` is a TimeStep
        holding the pre-reset obs/state/avail (identical to ``ts`` fields
        when no reset happened).
        """
        step_keys = jax.random.split(key, self.num_envs + 1)
        state2, ts = self._step_v(state, actions, step_keys[1:])
        if not self.auto_reset:
            return state2, ts, ts
        reset_keys = jax.random.split(step_keys[0], self.num_envs)
        reset_state, reset_ts = self._reset_v(reset_keys)
        ended = jnp.logical_or(ts.done, ts.truncated)

        def pick(a, b):
            # broadcast ended over trailing axes
            shape = (self.num_envs,) + (1,) * (a.ndim - 1)
            return jnp.where(ended.reshape(shape), a, b)

        new_state = jax.tree.map(pick, reset_state, state2)
        new_obs = pick(reset_ts.obs, ts.obs)
        new_state_feat = pick(reset_ts.state, ts.state)
        new_avail = pick(reset_ts.avail, ts.avail)
        out = ts.replace(obs=new_obs, state=new_state_feat, avail=new_avail)
        return new_state, out, ts

    def sample(self, key: chex.PRNGKey, avail: chex.Array) -> chex.Array:
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env.sample)(keys, avail)
