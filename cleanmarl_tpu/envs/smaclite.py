"""Pure-JAX SMAClite-class micro-combat (SMAC-style marine maps).

The reference trains its north-star config on SMAClite's ``3m`` map
through ``SMACliteWrapper`` (/root/reference/cleanmarl/env/
smaclite_wrapper.py; TimeLimit(150) at :14-15). The smaclite wheel is
not installed in this image, so this module re-implements the SMAC/
SMAClite micro-combat rules as branchless vectorized JAX, keeping the
SMAC interface contract the wrapper exposes:

- **Actions** (n_actions = 6 + n_enemies): 0 no-op (dead agents only),
  1 stop, 2/3/4/5 move north/south/east/west by ``MOVE_AMOUNT``,
  6+j attack enemy j.
- **Availability masks**: dead → no-op only; alive → stop + in-bounds
  moves + attack j iff enemy j alive and within ``SHOOT_RANGE``
  (smaclite_wrapper.py:45-46 forwards these to the learner).
- **Combat**: an attacking unit whose cooldown has elapsed deals
  ``damage`` to its target and resets its cooldown; the scripted enemy
  team focus-fires the nearest living agent in range, closing distance
  otherwise (SMAC's attack-move bot).
- **Reward** (team scalar): damage dealt + ``REWARD_KILL`` per enemy
  death + ``REWARD_WIN`` on wiping the enemy team, normalized so the
  maximum episode return is ``REWARD_SCALE`` (SMAC's
  reward_scale_rate=20 convention).
- **Obs** (per agent, SMAC layout, 30 dims for 3m): move availability
  (4) ‖ per-enemy [attackable, dist/sight, Δx/sight, Δy/sight, hp%]
  ‖ per-ally [visible, dist/sight, Δx/sight, Δy/sight, hp%] ‖ own hp%.
  Dead agents observe zeros.
- **State** (SMAC layout, 48 dims for 3m): per-ally
  [hp%, cooldown/max, Δx, Δy to map center] ‖ per-enemy [hp%, Δx, Δy]
  ‖ one-hot of every agent's last action.
- **battle_won** in the info dict (smaclite_wrapper drives the
  reference's rollout/eval battle_won scalars, vdn.py:347-352).

Maps: any homogeneous marine matchup ``{n}m`` (3m, 8m, 25m) or
``{n}m_vs_{m}m`` (5m_vs_6m, 10m_vs_11m).
"""
from __future__ import annotations

import re

import chex
import jax
import jax.numpy as jnp

from cleanmarl_tpu.envs.base import Environment
from cleanmarl_tpu.types import TimeStep

# marine stats (SMAC unit data)
MAX_HP = 45.0
DAMAGE = 6.0
COOLDOWN = 1.0        # env steps between shots (SMAC step ≈ weapon period)
SHOOT_RANGE = 6.0
SIGHT_RANGE = 9.0
MOVE_AMOUNT = 2.0
MAP_SIZE = 32.0
REWARD_KILL = 10.0
REWARD_WIN = 200.0
REWARD_SCALE = 20.0

# action layout
N_FIXED_ACTIONS = 6   # no-op, stop, N, S, E, W
MOVE_DIRS = jnp.array([[0.0, 1.0], [0.0, -1.0], [1.0, 0.0], [-1.0, 0.0]])


@chex.dataclass(frozen=True)
class SmacState:
    ally_pos: chex.Array     # (A, 2)
    ally_hp: chex.Array      # (A,)
    ally_cd: chex.Array      # (A,)
    enemy_pos: chex.Array    # (E, 2)
    enemy_hp: chex.Array     # (E,)
    enemy_cd: chex.Array     # (E,)
    last_action: chex.Array  # (A,) int32
    t: chex.Array            # () int32


class MicroCombat(Environment):
    def __init__(self, n_allies: int, n_enemies: int, time_limit: int = 150):
        self.n_agents = n_allies
        self.n_enemies = n_enemies
        self.episode_limit = time_limit
        self.n_actions = N_FIXED_ACTIONS + n_enemies
        # SMAC obs layout: move(4) + enemies*5 + allies*5 + own(1)
        self.obs_dim = 4 + n_enemies * 5 + (n_allies - 1) * 5 + 1
        # SMAC state layout: allies*4 + enemies*3 + last actions one-hot
        self.state_dim = n_allies * 4 + n_enemies * 3 + n_allies * self.n_actions
        max_return = n_enemies * (MAX_HP + REWARD_KILL) + REWARD_WIN
        self.reward_scale = REWARD_SCALE / max_return

    # ------------------------------------------------------------------
    def _reset(self, key):
        k1, k2 = jax.random.split(key)
        center_y = MAP_SIZE / 2.0
        ally_base = jnp.stack(
            [jnp.full((self.n_agents,), 9.0),
             center_y + (jnp.arange(self.n_agents) - (self.n_agents - 1) / 2.0) * 1.5],
            axis=-1,
        )
        enemy_base = jnp.stack(
            [jnp.full((self.n_enemies,), 23.0),
             center_y + (jnp.arange(self.n_enemies) - (self.n_enemies - 1) / 2.0) * 1.5],
            axis=-1,
        )
        s = SmacState(
            ally_pos=ally_base + jax.random.uniform(k1, (self.n_agents, 2), minval=-1.0, maxval=1.0),
            ally_hp=jnp.full((self.n_agents,), MAX_HP),
            ally_cd=jnp.zeros((self.n_agents,)),
            enemy_pos=enemy_base + jax.random.uniform(k2, (self.n_enemies, 2), minval=-1.0, maxval=1.0),
            enemy_hp=jnp.full((self.n_enemies,), MAX_HP),
            enemy_cd=jnp.zeros((self.n_enemies,)),
            last_action=jnp.zeros((self.n_agents,), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
        return s, self._timestep(s, 0.0, False, False, False)

    # ------------------------------------------------------------------
    def _avail(self, s: SmacState) -> chex.Array:
        alive = s.ally_hp > 0.0
        enemy_alive = s.enemy_hp > 0.0
        noop = jnp.logical_not(alive)[:, None]                       # (A,1)
        stop = alive[:, None]
        # moves available while alive and in bounds after the move
        cand = s.ally_pos[:, None, :] + MOVE_DIRS[None] * MOVE_AMOUNT  # (A,4,2)
        in_bounds = jnp.all((cand >= 0.5) & (cand <= MAP_SIZE - 0.5), axis=-1)
        moves = in_bounds & alive[:, None]
        dist = jnp.linalg.norm(
            s.ally_pos[:, None, :] - s.enemy_pos[None, :, :], axis=-1
        )                                                            # (A,E)
        attacks = (dist <= SHOOT_RANGE) & enemy_alive[None, :] & alive[:, None]
        return jnp.concatenate([noop, stop, moves, attacks], axis=-1)

    # ------------------------------------------------------------------
    def _obs(self, s: SmacState) -> chex.Array:
        alive = s.ally_hp > 0.0
        enemy_alive = s.enemy_hp > 0.0
        avail = self._avail(s)
        move_feats = avail[:, 2:6].astype(jnp.float32)               # (A,4)

        delta_e = s.enemy_pos[None, :, :] - s.ally_pos[:, None, :]   # (A,E,2)
        dist_e = jnp.linalg.norm(delta_e, axis=-1)
        vis_e = (dist_e <= SIGHT_RANGE) & enemy_alive[None, :]
        atk = avail[:, N_FIXED_ACTIONS:].astype(jnp.float32)
        enemy_feats = jnp.concatenate(
            [
                atk[..., None],
                jnp.where(vis_e, dist_e / SIGHT_RANGE, 0.0)[..., None],
                jnp.where(vis_e[..., None], delta_e / SIGHT_RANGE, 0.0),
                jnp.where(vis_e, s.enemy_hp[None, :] / MAX_HP, 0.0)[..., None],
            ],
            axis=-1,
        ).reshape(self.n_agents, -1)                                 # (A,E*5)

        delta_a = s.ally_pos[None, :, :] - s.ally_pos[:, None, :]    # (A,A,2)
        dist_a = jnp.linalg.norm(delta_a, axis=-1)
        vis_a = (dist_a <= SIGHT_RANGE) & alive[None, :]
        ally_feats_full = jnp.concatenate(
            [
                vis_a[..., None].astype(jnp.float32),
                jnp.where(vis_a, dist_a / SIGHT_RANGE, 0.0)[..., None],
                jnp.where(vis_a[..., None], delta_a / SIGHT_RANGE, 0.0),
                jnp.where(vis_a, s.ally_hp[None, :] / MAX_HP, 0.0)[..., None],
            ],
            axis=-1,
        )                                                            # (A,A,5)
        # drop self row per agent
        idx = jnp.arange(self.n_agents)
        order = jax.vmap(
            lambda i: jnp.delete(idx, i, assume_unique_indices=True)
        )(idx)                                                       # (A,A-1)
        ally_feats = jax.vmap(lambda feats, o: feats[o])(
            ally_feats_full, order
        ).reshape(self.n_agents, -1)

        own = (s.ally_hp / MAX_HP)[:, None]
        obs = jnp.concatenate([move_feats, enemy_feats, ally_feats, own], axis=-1)
        return jnp.where(alive[:, None], obs, 0.0)  # dead agents see zeros

    # ------------------------------------------------------------------
    def _state(self, s: SmacState) -> chex.Array:
        center = jnp.array([MAP_SIZE / 2.0, MAP_SIZE / 2.0])
        ally = jnp.concatenate(
            [
                (s.ally_hp / MAX_HP)[:, None],
                (s.ally_cd / COOLDOWN)[:, None],
                (s.ally_pos - center) / (MAP_SIZE / 2.0),
            ],
            axis=-1,
        ).reshape(-1)
        enemy = jnp.concatenate(
            [
                (s.enemy_hp / MAX_HP)[:, None],
                (s.enemy_pos - center) / (MAP_SIZE / 2.0),
            ],
            axis=-1,
        ).reshape(-1)
        last = jax.nn.one_hot(s.last_action, self.n_actions).reshape(-1)
        return jnp.concatenate([ally, enemy, last])

    def _timestep(self, s, reward, done, truncated, won):
        return TimeStep(
            obs=self._obs(s),
            state=self._state(s),
            avail=self._avail(s),
            reward=jnp.asarray(reward, jnp.float32),
            done=jnp.asarray(done, jnp.bool_),
            truncated=jnp.asarray(truncated, jnp.bool_),
            info={"battle_won": jnp.asarray(won, jnp.float32)},
        )

    # ------------------------------------------------------------------
    def _step(self, s: SmacState, actions, key):
        alive = s.ally_hp > 0.0
        enemy_alive = s.enemy_hp > 0.0
        actions = jnp.where(alive, actions, 0)

        # ---- movement --------------------------------------------------
        is_move = (actions >= 2) & (actions < N_FIXED_ACTIONS)
        dir_idx = jnp.clip(actions - 2, 0, 3)
        step_vec = MOVE_DIRS[dir_idx] * MOVE_AMOUNT * is_move[:, None]
        ally_pos = jnp.clip(s.ally_pos + step_vec, 0.5, MAP_SIZE - 0.5)

        # ---- ally attacks ---------------------------------------------
        is_attack = actions >= N_FIXED_ACTIONS
        target = jnp.clip(actions - N_FIXED_ACTIONS, 0, self.n_enemies - 1)
        dist = jnp.linalg.norm(
            ally_pos[:, None, :] - s.enemy_pos[None, :, :], axis=-1
        )
        in_range = jnp.take_along_axis(dist, target[:, None], axis=1)[:, 0] <= SHOOT_RANGE
        can_fire = is_attack & alive & (s.ally_cd <= 0.0) & in_range \
            & jnp.take_along_axis(enemy_alive[None, :].repeat(self.n_agents, 0), target[:, None], axis=1)[:, 0]
        dmg_out = jnp.zeros((self.n_enemies,)).at[target].add(
            jnp.where(can_fire, DAMAGE, 0.0)
        )
        ally_cd = jnp.where(can_fire, COOLDOWN, jnp.maximum(s.ally_cd - 1.0, 0.0))

        hp_before = s.enemy_hp
        enemy_hp = jnp.clip(hp_before - dmg_out, 0.0, MAX_HP)
        damage_dealt = jnp.sum(hp_before - enemy_hp)
        kills = jnp.sum(((hp_before > 0.0) & (enemy_hp <= 0.0)).astype(jnp.float32))

        # ---- scripted enemy team: focus nearest, close distance -------
        enemy_alive2 = enemy_hp > 0.0
        dist_ea = jnp.linalg.norm(
            s.enemy_pos[:, None, :] - ally_pos[None, :, :], axis=-1
        )                                                            # (E,A)
        dist_masked = jnp.where(alive[None, :], dist_ea, jnp.inf)
        nearest = jnp.argmin(dist_masked, axis=-1)                   # (E,)
        nearest_dist = jnp.min(dist_masked, axis=-1)
        any_target = jnp.isfinite(nearest_dist)
        fire = enemy_alive2 & any_target & (nearest_dist <= SHOOT_RANGE) & (s.enemy_cd <= 0.0)
        dmg_in = jnp.zeros((self.n_agents,)).at[nearest].add(
            jnp.where(fire, DAMAGE, 0.0)
        )
        enemy_cd = jnp.where(fire, COOLDOWN, jnp.maximum(s.enemy_cd - 1.0, 0.0))
        # move toward nearest agent when out of range
        tgt_pos = ally_pos[nearest]
        to_tgt = tgt_pos - s.enemy_pos
        norm = jnp.linalg.norm(to_tgt, axis=-1, keepdims=True) + 1e-8
        advance = enemy_alive2 & any_target & (nearest_dist > SHOOT_RANGE)
        enemy_pos = jnp.clip(
            s.enemy_pos + to_tgt / norm * MOVE_AMOUNT * advance[:, None],
            0.5, MAP_SIZE - 0.5,
        )
        ally_hp = jnp.clip(s.ally_hp - dmg_in, 0.0, MAX_HP)

        # ---- termination / reward -------------------------------------
        t2 = s.t + 1
        all_enemies_dead = jnp.all(enemy_hp <= 0.0)
        all_allies_dead = jnp.all(ally_hp <= 0.0)
        done = jnp.logical_or(all_enemies_dead, all_allies_dead)
        won = all_enemies_dead
        truncated = jnp.logical_and(t2 >= self.episode_limit, jnp.logical_not(done))
        reward = (
            damage_dealt
            + REWARD_KILL * kills
            + REWARD_WIN * won.astype(jnp.float32)
        ) * self.reward_scale

        s2 = SmacState(
            ally_pos=ally_pos,
            ally_hp=ally_hp,
            ally_cd=ally_cd,
            enemy_pos=enemy_pos,
            enemy_hp=enemy_hp,
            enemy_cd=enemy_cd,
            last_action=actions,
            t=t2,
        )
        return s2, self._timestep(s2, reward, done, truncated, won)


def make(map_name: str, time_limit: int = 150, **kwargs) -> Environment:
    m = re.fullmatch(r"(\d+)m", map_name)
    if m:
        n = int(m.group(1))
        return MicroCombat(n, n, time_limit=time_limit)
    m = re.fullmatch(r"(\d+)m_vs_(\d+)m", map_name)
    if m:
        return MicroCombat(int(m.group(1)), int(m.group(2)), time_limit=time_limit)
    raise ValueError(
        f"unknown smaclite map {map_name!r}; supported: Nm (e.g. 3m, 8m) "
        f"and Nm_vs_Mm (e.g. 5m_vs_6m)"
    )
