"""Environment wrappers (pure-JAX, compose by delegation).

``AgentIDWrapper`` appends a one-hot agent id to each agent's observation,
mirroring the reference's ``agent_ids`` flag
(/root/reference/cleanmarl/env/pettingzoo_wrapper.py:96-97, obs_size
accounting at :76).
"""
from __future__ import annotations

import jax.numpy as jnp

from cleanmarl_tpu.envs.base import Environment


class AgentIDWrapper(Environment):
    def __init__(self, env: Environment):
        self.env = env
        self.n_agents = env.n_agents
        self.obs_dim = env.obs_dim + env.n_agents
        self.state_dim = env.state_dim
        self.n_actions = env.n_actions
        self.episode_limit = env.episode_limit

    def _augment(self, ts):
        eye = jnp.eye(self.n_agents, dtype=ts.obs.dtype)
        return ts.replace(obs=jnp.concatenate([ts.obs, eye], axis=-1))

    def _reset(self, key):
        state, ts = self.env.reset(key)
        return state, self._augment(ts)

    def _step(self, state, actions, key):
        state, ts = self.env.step(state, actions, key)
        return state, self._augment(ts)
