"""Pure-JAX Level-Based Foraging (LBF).

TPU-native port of the lbforaging environments the reference wraps
(/root/reference/cleanmarl/env/lbf.py; the lbforaging wheel is not
installed in this image). Mechanics follow the published
semeio/lbforaging rules:

- Grid world S×S with P players (levels 1..max_player_level) and F
  foods. Actions: 0 NONE, 1 NORTH (y−1), 2 SOUTH (y+1), 3 WEST (x−1),
  4 EAST (x+1), 5 LOAD.
- A move succeeds iff the target cell is inside the grid, not a food,
  and not targeted/occupied by another player (conflicts → everyone
  involved stays).
- LOAD: all players orthogonally adjacent to a food who chose LOAD
  "cooperate"; the food is collected iff the sum of their levels ≥ the
  food level. Each loader is rewarded
  ``food_level · player_level / Σ loader_levels``, normalized by the
  total food level spawned so the per-episode team return sums to ≤ 1.
- Episode terminates when every food is collected; otherwise truncates
  at ``time_limit`` (the wrapper's TimeLimit(150) + terminated-at-limit
  truncation fix, /root/reference/cleanmarl/env/lbf.py:14-15, 34-35).
- Obs per agent (lbforaging layout, dim 3F+3P): per-food (y, x, level)
  with collected foods at (−1, −1, 0), then OWN (y, x, level), then the
  other players' triples. Global state = concat of all agents' obs
  (reference wrapper, env/lbf.py:71-74). No action masks (the wrapper
  reports all-available, env/lbf.py:59-64).
- ``reward_aggr`` ∈ {"sum", "mean"} aggregates per-agent rewards into
  the team scalar (env/lbf.py:29-32).

Map names: ``Foraging-{S}x{S}-{P}p-{F}f[-coop]-v3`` (e.g.
``Foraging-8x8-2p-3f-v3``). In coop mode every food spawns at the sum
of all player levels, forcing joint loads.
"""
from __future__ import annotations

import re

import chex
import jax
import jax.numpy as jnp

from cleanmarl_tpu.envs.base import Environment
from cleanmarl_tpu.types import TimeStep

NONE, NORTH, SOUTH, WEST, EAST, LOAD = range(6)
MOVES = jnp.array([[0, 0], [-1, 0], [1, 0], [0, -1], [0, 1], [0, 0]])  # (dy,dx)


@chex.dataclass(frozen=True)
class LBFState:
    player_pos: chex.Array    # (P, 2) int32 (y, x)
    player_level: chex.Array  # (P,) int32
    food_pos: chex.Array      # (F, 2) int32
    food_level: chex.Array    # (F,) int32 — 0 when collected
    total_food: chex.Array    # () f32 — initial Σ food levels (for norm)
    t: chex.Array             # () int32


class LBF(Environment):
    def __init__(
        self,
        grid_size: int = 8,
        n_agents: int = 2,
        n_foods: int = 3,
        max_player_level: int = 3,
        coop: bool = False,
        time_limit: int = 150,
        reward_aggr: str = "sum",
    ):
        self.grid_size = grid_size
        self.n_agents = n_agents
        self.n_foods = n_foods
        self.max_player_level = max_player_level
        self.coop = coop
        self.episode_limit = time_limit
        self.reward_aggr = reward_aggr
        self.n_actions = 6
        self.obs_dim = 3 * n_foods + 3 * n_agents
        self.state_dim = self.obs_dim * n_agents

    # ------------------------------------------------------------------
    def _obs(self, s: LBFState) -> chex.Array:
        eaten = s.food_level <= 0
        food_feat = jnp.concatenate(
            [
                jnp.where(eaten[:, None], -1, s.food_pos).astype(jnp.float32),
                jnp.where(eaten, 0, s.food_level).astype(jnp.float32)[:, None],
            ],
            axis=-1,
        ).reshape(-1)                                           # (3F,)
        player_feat = jnp.concatenate(
            [s.player_pos.astype(jnp.float32),
             s.player_level.astype(jnp.float32)[:, None]],
            axis=-1,
        )                                                       # (P, 3)
        idx = jnp.arange(self.n_agents)
        order = jax.vmap(
            lambda i: jnp.concatenate(
                [jnp.array([i]), jnp.delete(idx, i, assume_unique_indices=True)]
            )
        )(idx)                                                  # (P, P) self-first
        per_agent = jax.vmap(lambda o: player_feat[o].reshape(-1))(order)
        food_b = jnp.tile(food_feat[None, :], (self.n_agents, 1))
        return jnp.concatenate([food_b, per_agent], axis=-1)

    def _timestep(self, s, reward, done, truncated, agent_rewards=None):
        obs = self._obs(s)
        if agent_rewards is None:
            agent_rewards = jnp.zeros((self.n_agents,), jnp.float32)
        return TimeStep(
            obs=obs,
            state=obs.reshape(-1),
            avail=jnp.ones((self.n_agents, self.n_actions), jnp.bool_),
            reward=jnp.asarray(reward, jnp.float32),
            done=jnp.asarray(done, jnp.bool_),
            truncated=jnp.asarray(truncated, jnp.bool_),
            info={
                "battle_won": jnp.zeros((), jnp.float32),
                # per-agent rewards for reward_aggr=None consumers
                # (coma_lbf.py:255 uses un-aggregated LBF rewards)
                "agent_rewards": jnp.asarray(agent_rewards, jnp.float32),
            },
        )

    def _reset(self, key):
        kp, kl, kf, kfl = jax.random.split(key, 4)
        n_cells = self.grid_size * self.grid_size
        cells = jax.random.permutation(kp, n_cells)
        player_cells = cells[: self.n_agents]
        food_cells = cells[self.n_agents : self.n_agents + self.n_foods]
        to_yx = lambda c: jnp.stack([c // self.grid_size, c % self.grid_size], -1)
        player_level = jax.random.randint(
            kl, (self.n_agents,), 1, self.max_player_level + 1
        )
        if self.coop:
            food_level = jnp.full((self.n_foods,), jnp.sum(player_level))
        else:
            food_level = jax.random.randint(
                kfl, (self.n_foods,), 1, self.max_player_level + 1
            )
        s = LBFState(
            player_pos=to_yx(player_cells).astype(jnp.int32),
            player_level=player_level.astype(jnp.int32),
            food_pos=to_yx(food_cells).astype(jnp.int32),
            food_level=food_level.astype(jnp.int32),
            total_food=jnp.sum(food_level).astype(jnp.float32),
            t=jnp.zeros((), jnp.int32),
        )
        return s, self._timestep(s, 0.0, False, False)

    # ------------------------------------------------------------------
    def _step(self, s: LBFState, actions, key):
        P, F = self.n_agents, self.n_foods
        actions = jnp.clip(actions, 0, self.n_actions - 1)

        # ---- movement --------------------------------------------------
        proposed = s.player_pos + MOVES[actions]
        in_bounds = jnp.all(
            (proposed >= 0) & (proposed < self.grid_size), axis=-1
        )
        alive_food = s.food_level > 0
        on_food = jnp.any(
            jnp.all(proposed[:, None, :] == s.food_pos[None, :, :], axis=-1)
            & alive_food[None, :],
            axis=-1,
        )
        # same-target conflicts (including moving into a stationary player)
        same_target = jnp.sum(
            jnp.all(proposed[:, None, :] == proposed[None, :, :], axis=-1),
            axis=-1,
        ) > 1
        into_player = jnp.any(
            jnp.all(proposed[:, None, :] == s.player_pos[None, :, :], axis=-1)
            & (jnp.arange(P)[:, None] != jnp.arange(P)[None, :]),
            axis=-1,
        )
        ok = in_bounds & ~on_food & ~same_target & ~into_player
        player_pos = jnp.where(ok[:, None], proposed, s.player_pos)

        # ---- loading ---------------------------------------------------
        loading = actions == LOAD
        dist = jnp.sum(
            jnp.abs(player_pos[:, None, :] - s.food_pos[None, :, :]), axis=-1
        )                                                      # (P, F) L1
        adjacent = dist == 1
        part = adjacent & loading[:, None] & alive_food[None, :]   # (P,F)
        loader_sum = jnp.sum(
            part * s.player_level[:, None], axis=0
        )                                                       # (F,)
        collected = alive_food & (loader_sum >= s.food_level) & (loader_sum > 0)
        share = jnp.where(
            collected[None, :] & part,
            s.food_level[None, :]
            * s.player_level[:, None]
            / jnp.maximum(loader_sum[None, :], 1),
            0.0,
        )                                                       # (P,F)
        rewards = jnp.sum(share, axis=-1) / jnp.maximum(s.total_food, 1.0)
        food_level = jnp.where(collected, 0, s.food_level)

        t2 = s.t + 1
        done = jnp.all(food_level <= 0)
        truncated = jnp.logical_and(t2 >= self.episode_limit, jnp.logical_not(done))
        if self.reward_aggr == "mean":
            team = rewards.mean()
        else:
            team = rewards.sum()
        s2 = s.replace(
            player_pos=player_pos, food_level=food_level, t=t2
        )
        return s2, self._timestep(s2, team, done, truncated, agent_rewards=rewards)


def make(env_name: str, **kwargs) -> Environment:
    m = re.fullmatch(
        r"Foraging-(\d+)x(\d+)-(\d+)p-(\d+)f(-coop)?(?:-v\d+)?", env_name
    )
    if not m:
        raise ValueError(
            f"unknown LBF map {env_name!r}; expected "
            f"Foraging-{{S}}x{{S}}-{{P}}p-{{F}}f[-coop]-v3"
        )
    if m.group(1) != m.group(2):
        raise ValueError(f"only square grids supported, got {env_name!r}")
    return LBF(
        grid_size=int(m.group(1)),
        n_agents=int(m.group(3)),
        n_foods=int(m.group(4)),
        coop=m.group(5) is not None,
        **kwargs,
    )
