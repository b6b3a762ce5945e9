"""Deterministic cooperative matrix/"follow-the-light" game.

The test backend: a tiny fully-observable cooperative game with a known
optimal return, used for unit fixtures and end-to-end learning smoke
tests (the reference has no tests or fake envs at all — SURVEY.md §4).

Dynamics: at step t a "target" action ``g = t mod n_actions`` is shown to
every agent as a one-hot observation. Team reward = (#agents choosing g)
/ n_agents. Availability masks are exercised: at odd steps the action
``(g+1) mod n_actions`` is unavailable (the target is always available,
so the optimum is unaffected). If ``done_on_jackpot`` and all agents hit
the target, the episode terminates (done=True) with a +1 bonus —
exercising terminal bootstrapping. Otherwise episodes run to
``episode_limit`` and truncate (done=False, truncated=True), exercising
time-limit bootstrapping (cf. /root/reference/cleanmarl/env/lbf.py:34-35).

Optimal per-step reward is 1.0; without jackpot the optimal episode
return equals ``episode_limit``.
"""
from __future__ import annotations

import chex
import jax.numpy as jnp

from cleanmarl_tpu.envs.base import Environment
from cleanmarl_tpu.types import TimeStep


@chex.dataclass(frozen=True)
class MatrixGameState:
    t: chex.Array  # () int32


class MatrixGame(Environment):
    def __init__(
        self,
        n_agents: int = 2,
        n_actions: int = 3,
        episode_limit: int = 8,
        done_on_jackpot: bool = False,
        mask_trick: bool = True,
    ):
        """``mask_trick=False`` keeps every action available — needed by
        deterministic-policy-gradient learners (MADDPG/FACMAC), for which
        the parity-dependent mask makes the observation ambiguous."""
        self.n_agents = n_agents
        self.n_actions = n_actions
        self.episode_limit = episode_limit
        self.done_on_jackpot = done_on_jackpot
        self.mask_trick = mask_trick
        self.obs_dim = n_actions
        self.state_dim = n_actions * n_agents

    def _obs(self, t):
        g = jnp.mod(t, self.n_actions)
        onehot = jnp.zeros((self.n_actions,), jnp.float32).at[g].set(1.0)
        obs = jnp.tile(onehot[None, :], (self.n_agents, 1))
        state = obs.reshape(-1)
        return obs, state

    def _avail(self, t):
        avail = jnp.ones((self.n_agents, self.n_actions), jnp.bool_)
        if not self.mask_trick:
            return avail
        g = jnp.mod(t, self.n_actions)
        blocked = jnp.mod(g + 1, self.n_actions)
        odd = jnp.mod(t, 2) == 1
        return avail.at[:, blocked].set(jnp.logical_not(odd))

    def _reset(self, key):
        t = jnp.zeros((), jnp.int32)
        obs, state = self._obs(t)
        ts = TimeStep(
            obs=obs,
            state=state,
            avail=self._avail(t),
            reward=jnp.zeros((), jnp.float32),
            done=jnp.zeros((), jnp.bool_),
            truncated=jnp.zeros((), jnp.bool_),
            info={"battle_won": jnp.zeros((), jnp.float32)},
        )
        return MatrixGameState(t=t), ts

    def _step(self, state: MatrixGameState, actions, key):
        g = jnp.mod(state.t, self.n_actions)
        hits = (actions == g).astype(jnp.float32)
        reward = hits.mean()
        jackpot = jnp.all(actions == g)
        done = jnp.logical_and(jackpot, self.done_on_jackpot)
        reward = reward + jnp.where(done, 1.0, 0.0)
        t2 = state.t + 1
        truncated = jnp.logical_and(t2 >= self.episode_limit, jnp.logical_not(done))
        obs, state_feat = self._obs(t2)
        ts = TimeStep(
            obs=obs,
            state=state_feat,
            avail=self._avail(t2),
            reward=reward,
            done=done,
            truncated=truncated,
            info={"battle_won": jackpot.astype(jnp.float32)},
        )
        return MatrixGameState(t=t2), ts
