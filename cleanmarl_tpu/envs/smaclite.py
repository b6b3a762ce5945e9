"""Pure-JAX SMAClite-class micro-combat (SMAC-style maps).

The reference trains its north-star config on SMAClite's ``3m`` map
through ``SMACliteWrapper`` (/root/reference/cleanmarl/env/
smaclite_wrapper.py; TimeLimit(150) at :14-15). The smaclite wheel is
not installed in this image, so this module re-implements the SMAC/
SMAClite micro-combat rules as branchless vectorized JAX, keeping the
SMAC interface contract the wrapper exposes:

- **Actions** (n_actions = 6 + n_enemies): 0 no-op (dead agents only),
  1 stop, 2/3/4/5 move north/south/east/west by the unit's per-step
  move distance (``MOVE_AMOUNT * speed/3.15`` — marine 2.0, stalker/
  medivac ≈2.62; ENVS_FIDELITY S3),
  6+j attack enemy j. An attack order out of the unit's true weapon
  range moves the unit toward its target instead (SC2 attack-move), so
  melee units close distance automatically.
- **Availability masks**: dead → no-op only; alive → stop + in-bounds
  moves + attack j iff enemy j alive and within ``ORDER_RANGE``
  (smaclite_wrapper.py:45-46 forwards these to the learner).
- **Combat**: a firing unit whose cooldown has elapsed deals its
  type's damage (shields absorb first; Protoss shields regenerate
  +2/step when not hit); the scripted enemy team plays SC2-style
  attack-move (SMAC's bot): each enemy unit independently acquires
  the ally nearest *to itself* and **keeps that target until it dies
  or leaves sight range** (SC2 auto-attack target persistence —
  perfect per-step refocusing onto the globally nearest ally would be
  strictly stronger than the SC2 AI and makes 3m unwinnable at SMAC
  rates; verified by scripts/forensic_3m_scripted.py), closing
  distance when out of weapon range.
- **Reward** (team scalar): damage dealt (hp + shield) + ``REWARD_KILL``
  per enemy death + ``REWARD_WIN`` on wiping the enemy team, normalized
  so the maximum episode return is ``REWARD_SCALE`` (SMAC's
  reward_scale_rate=20 convention).
- **Obs** (per agent, SMAC layout): move availability (4) ‖ per-enemy
  [attackable, dist/sight, Δx/sight, Δy/sight, hp% (, shield%)(, type
  one-hot)] ‖ per-ally [visible, dist, Δx, Δy, hp% (, shield%)(, type)]
  ‖ own [hp% (, shield%)(, type)]. Shield features appear iff the map
  has Protoss units; type bits iff it mixes unit types — so marine
  maps keep the classic dims (30 for 3m). Dead agents observe zeros.
- **State** (SMAC layout): per-ally [hp%, cooldown/max, Δx, Δy
  (, shield%)(, type)] ‖ per-enemy [hp%, Δx, Δy (, shield%)(, type)] ‖
  one-hot of every agent's last action (48 dims for 3m).
- **battle_won** in the info dict (smaclite_wrapper drives the
  reference's rollout/eval battle_won scalars, vdn.py:347-352).

Maps: marine matchups ``{n}m`` / ``{n}m_vs_{m}m`` (3m, 8m, 5m_vs_6m),
Protoss mixes ``{a}s{b}z`` (2s3z, 3s5z — stalkers+zealots, mirrored
teams), and the Terran MMM class (``MMM`` mirror, ``MMM2`` asymmetric:
medivac + marauders + marines — smaclite_wrapper.py:14 loads any
smaclite map name, so the grammar here covers every SMAC map family the
reference's experiments use).

**Healers (medivac):** a unit whose type sets ``heal=True`` repurposes
its attack actions as heal orders on *allies* (SMAC's medivac
semantics): action ``6+j`` heals ally j (never itself, never another
healer), restoring ``dmg`` hp per shot up to the target's max. Healing
grants no reward; the scripted enemy team's medivac follows its most
damaged living teammate and heals it. Healer-free maps compile to
exactly the same XLA program as before (all healer paths are gated on
Python-level booleans).
"""
from __future__ import annotations

import re
from typing import List, Tuple

import chex
import jax
import jax.numpy as jnp

from cleanmarl_tpu.envs.base import Environment
from cleanmarl_tpu.types import TimeStep

# unit stat table (hp, shield, damage per attack, cooldown in env steps,
# weapon range) — SMAC unit data mapped onto the one-attack-per-step
# timescale used here
UNIT_TYPES = {
    # ``speed`` is the SC2 movement speed (game units/s — the smaclite
    # wheel's unit data); per-env-step move distance scales it onto the
    # uniform timescale as MOVE_AMOUNT * speed / BASE_SPEED, so marine
    # maps keep the historical 2.0/step bit-for-bit while stalkers and
    # medivacs (4.13) outrun zealots/marauders/marines (3.15) — the
    # kiting asymmetry SMAC's heterogeneous maps reward
    # (ENVS_FIDELITY.md S3, closed round 5)
    "marine":   dict(hp=45.0,  shield=0.0,  dmg=6.0,  cd=1.0, rng=6.0,
                     speed=3.15),
    "stalker":  dict(hp=80.0,  shield=80.0, dmg=13.0, cd=2.0, rng=6.0,
                     speed=4.13),
    "zealot":   dict(hp=100.0, shield=50.0, dmg=16.0, cd=1.0, rng=1.5,
                     speed=3.15),
    "marauder": dict(hp=125.0, shield=0.0,  dmg=12.0, cd=2.0, rng=6.0,
                     speed=3.15),
    # heal=True: ``dmg`` is hp healed per shot on an ALLY target
    # (SC2 heal 12.6 hp/s ≈ 1.3× marine dps → 8 on this timescale)
    "medivac":  dict(hp=150.0, shield=0.0,  dmg=8.0,  cd=1.0, rng=4.0,
                     heal=True, speed=4.13),
}
TYPE_ORDER = ("marine", "stalker", "zealot", "marauder", "medivac")

ORDER_RANGE = 6.0     # attack-order availability radius (SMAC shoot range)
SIGHT_RANGE = 9.0
PURSUE_MARGIN = 2.0   # bot target-lock leash beyond its weapon range
MOVE_AMOUNT = 2.0     # per-step move distance at BASE_SPEED
BASE_SPEED = 3.15     # marine speed — the unit the timescale is pinned to
MAP_SIZE = 32.0
REWARD_KILL = 10.0
REWARD_WIN = 200.0
REWARD_SCALE = 20.0
SHIELD_REGEN = 2.0
UNIT_RADIUS = 0.5     # collision radius (S11 opt-in lever; SC2 radii 0.375-0.75)

# kept for external use/tests (marine baseline)
MAX_HP = UNIT_TYPES["marine"]["hp"]
DAMAGE = UNIT_TYPES["marine"]["dmg"]
COOLDOWN = UNIT_TYPES["marine"]["cd"]
SHOOT_RANGE = UNIT_TYPES["marine"]["rng"]

# action layout
N_FIXED_ACTIONS = 6   # no-op, stop, N, S, E, W
MOVE_DIRS = jnp.array([[0.0, 1.0], [0.0, -1.0], [1.0, 0.0], [-1.0, 0.0]])


@chex.dataclass(frozen=True)
class SmacState:
    ally_pos: chex.Array     # (A, 2)
    ally_hp: chex.Array      # (A,)
    ally_shield: chex.Array  # (A,)
    ally_cd: chex.Array      # (A,)
    enemy_pos: chex.Array    # (E, 2)
    enemy_hp: chex.Array     # (E,)
    enemy_shield: chex.Array # (E,)
    enemy_cd: chex.Array     # (E,)
    enemy_target: chex.Array # (E,) int32; -1 = no acquired target
    last_action: chex.Array  # (A,) int32
    t: chex.Array            # () int32


def _stat(types: List[str], key: str) -> chex.Array:
    return jnp.array([UNIT_TYPES[t][key] for t in types], jnp.float32)


class MicroCombat(Environment):
    def __init__(
        self,
        ally_types,
        enemy_types,
        time_limit: int = 150,
        unit_collisions: bool = False,
    ):
        # S11 opt-in: pairwise unit collision resolve (default OFF — the
        # validated maps/transcripts were recorded without it; see
        # ENVS_FIDELITY.md S11)
        self.unit_collisions = unit_collisions
        # ints = marine counts (the original homogeneous constructor)
        if isinstance(ally_types, int):
            ally_types = ["marine"] * ally_types
        if isinstance(enemy_types, int):
            enemy_types = ["marine"] * enemy_types
        self.ally_types = list(ally_types)
        self.enemy_types = list(enemy_types)
        self.n_agents = len(ally_types)
        self.n_enemies = len(enemy_types)
        self.episode_limit = time_limit
        # healers target allies, so with an ally healer the target-action
        # block must also cover the ally indices (SMAC keeps one shared
        # action space; on every published MMM map n_enemies ≥ n_agents)
        self.ally_heals = any(
            UNIT_TYPES[t].get("heal", False) for t in ally_types
        )
        self.enemy_heals = any(
            UNIT_TYPES[t].get("heal", False) for t in enemy_types
        )
        n_targets = self.n_enemies
        if self.ally_heals:
            n_targets = max(self.n_enemies, self.n_agents)
        self.n_actions = N_FIXED_ACTIONS + n_targets

        ally_types, enemy_types = self.ally_types, self.enemy_types
        self.a_max_hp = _stat(ally_types, "hp")
        self.a_max_sh = _stat(ally_types, "shield")
        self.a_dmg = _stat(ally_types, "dmg")
        self.a_cd = _stat(ally_types, "cd")
        self.a_rng = _stat(ally_types, "rng")
        self.e_max_hp = _stat(enemy_types, "hp")
        self.e_max_sh = _stat(enemy_types, "shield")
        self.e_dmg = _stat(enemy_types, "dmg")
        self.e_cd = _stat(enemy_types, "cd")
        self.e_rng = _stat(enemy_types, "rng")
        # per-unit per-step move distance (S3: per-type speeds). The
        # ratio is formed in python float64 FIRST so BASE_SPEED units
        # come out exactly MOVE_AMOUNT (2.0) — marine-map dynamics and
        # transcripts stay bit-for-bit identical to the uniform era.
        def _move(types):
            return jnp.array(
                [UNIT_TYPES[t]["speed"] / BASE_SPEED * MOVE_AMOUNT
                 for t in types], jnp.float32,
            )

        self.a_move = _move(ally_types)
        self.e_move = _move(enemy_types)
        self.a_heal = jnp.array(
            [UNIT_TYPES[t].get("heal", False) for t in ally_types], jnp.bool_
        )
        self.e_heal = jnp.array(
            [UNIT_TYPES[t].get("heal", False) for t in enemy_types], jnp.bool_
        )

        all_types = set(ally_types) | set(enemy_types)
        self.has_shields = any(UNIT_TYPES[t]["shield"] > 0 for t in all_types)
        self.type_list = [t for t in TYPE_ORDER if t in all_types]
        self.type_bits = len(self.type_list) if len(self.type_list) > 1 else 0
        self.a_type_oh = jnp.array(
            [[1.0 if t == tt else 0.0 for tt in self.type_list[: self.type_bits]]
             for t in ally_types], jnp.float32,
        ).reshape(self.n_agents, self.type_bits)
        self.e_type_oh = jnp.array(
            [[1.0 if t == tt else 0.0 for tt in self.type_list[: self.type_bits]]
             for t in enemy_types], jnp.float32,
        ).reshape(self.n_enemies, self.type_bits)

        sh = 1 if self.has_shields else 0
        tb = self.type_bits
        self._unit_feat = 5 + sh + tb       # per-enemy / per-ally obs feats
        self.obs_dim = (
            4
            + self.n_enemies * self._unit_feat
            + (self.n_agents - 1) * self._unit_feat
            + 1 + sh + tb                   # own feats
        )
        self.state_dim = (
            self.n_agents * (4 + sh + tb)
            + self.n_enemies * (3 + sh + tb)
            + self.n_agents * self.n_actions
        )
        max_return = float(
            jnp.sum(self.e_max_hp + self.e_max_sh) + self.n_enemies * REWARD_KILL
        ) + REWARD_WIN
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
            ally_hp=self.a_max_hp,
            ally_shield=self.a_max_sh,
            ally_cd=jnp.zeros((self.n_agents,)),
            enemy_pos=enemy_base + jax.random.uniform(k2, (self.n_enemies, 2), minval=-1.0, maxval=1.0),
            enemy_hp=self.e_max_hp,
            enemy_shield=self.e_max_sh,
            enemy_cd=jnp.zeros((self.n_enemies,)),
            enemy_target=jnp.full((self.n_enemies,), -1, jnp.int32),
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
        cand = (
            s.ally_pos[:, None, :]
            + MOVE_DIRS[None] * self.a_move[:, None, None]
        )                                                            # (A,4,2)
        in_bounds = jnp.all((cand >= 0.5) & (cand <= MAP_SIZE - 0.5), axis=-1)
        moves = in_bounds & alive[:, None]
        dist = jnp.linalg.norm(
            s.ally_pos[:, None, :] - s.enemy_pos[None, :, :], axis=-1
        )                                                            # (A,E)
        attacks = (dist <= ORDER_RANGE) & enemy_alive[None, :] & alive[:, None]
        n_tgt = self.n_actions - N_FIXED_ACTIONS
        if self.ally_heals:
            # healer rows: action 6+j = heal ally j (alive, in order
            # range, not self, not another healer)
            attacks = attacks & (~self.a_heal)[:, None]
            dist_aa = jnp.linalg.norm(
                s.ally_pos[:, None, :] - s.ally_pos[None, :, :], axis=-1
            )                                                        # (A,A)
            not_self = ~jnp.eye(self.n_agents, dtype=jnp.bool_)
            heals = (
                (dist_aa <= ORDER_RANGE) & alive[None, :] & alive[:, None]
                & self.a_heal[:, None] & (~self.a_heal)[None, :] & not_self
            )
            pad_e = n_tgt - self.n_enemies
            pad_a = n_tgt - self.n_agents
            attacks = jnp.pad(attacks, ((0, 0), (0, pad_e)))
            heals = jnp.pad(heals, ((0, 0), (0, pad_a)))
            attacks = attacks | heals
        return jnp.concatenate([noop, stop, moves, attacks], axis=-1)

    # ------------------------------------------------------------------
    def _unit_obs_feats(self, vis, dist, delta, hp, max_hp, shield, max_sh, type_oh):
        """Shared per-unit observation features (..., U, feat)."""
        feats = [
            jnp.where(vis, dist / SIGHT_RANGE, 0.0)[..., None],
            jnp.where(vis[..., None], delta / SIGHT_RANGE, 0.0),
            jnp.where(vis, hp / max_hp, 0.0)[..., None],
        ]
        if self.has_shields:
            sh_pct = jnp.where(max_sh > 0, shield / jnp.maximum(max_sh, 1.0), 0.0)
            feats.append(jnp.where(vis, sh_pct, 0.0)[..., None])
        if self.type_bits:
            feats.append(
                jnp.where(vis[..., None], jnp.broadcast_to(type_oh, vis.shape + (self.type_bits,)), 0.0)
            )
        return jnp.concatenate(feats, axis=-1)

    def _obs(self, s: SmacState, avail=None) -> chex.Array:
        alive = s.ally_hp > 0.0
        enemy_alive = s.enemy_hp > 0.0
        if avail is None:
            avail = self._avail(s)
        move_feats = avail[:, 2:6].astype(jnp.float32)               # (A,4)

        delta_e = s.enemy_pos[None, :, :] - s.ally_pos[:, None, :]   # (A,E,2)
        dist_e = jnp.linalg.norm(delta_e, axis=-1)
        vis_e = (dist_e <= SIGHT_RANGE) & enemy_alive[None, :]
        # per-enemy attackable bit (healer rows carry heal bits in the
        # avail mask instead, so recompute the enemy-indexed version)
        atk = (
            (dist_e <= ORDER_RANGE) & enemy_alive[None, :] & alive[:, None]
        )
        if self.ally_heals:
            atk = atk & (~self.a_heal)[:, None]
        atk = atk.astype(jnp.float32)
        enemy_feats = jnp.concatenate(
            [
                atk[..., None],
                self._unit_obs_feats(
                    vis_e, dist_e, delta_e,
                    s.enemy_hp[None, :], self.e_max_hp[None, :],
                    s.enemy_shield[None, :], self.e_max_sh[None, :],
                    self.e_type_oh[None, :, :],
                ),
            ],
            axis=-1,
        ).reshape(self.n_agents, -1)

        delta_a = s.ally_pos[None, :, :] - s.ally_pos[:, None, :]    # (A,A,2)
        dist_a = jnp.linalg.norm(delta_a, axis=-1)
        vis_a = (dist_a <= SIGHT_RANGE) & alive[None, :]
        ally_feats_full = jnp.concatenate(
            [
                vis_a[..., None].astype(jnp.float32),
                self._unit_obs_feats(
                    vis_a, dist_a, delta_a,
                    s.ally_hp[None, :], self.a_max_hp[None, :],
                    s.ally_shield[None, :], self.a_max_sh[None, :],
                    self.a_type_oh[None, :, :],
                ),
            ],
            axis=-1,
        )                                                            # (A,A,f)
        idx = jnp.arange(self.n_agents)
        order = jax.vmap(
            lambda i: jnp.delete(idx, i, assume_unique_indices=True)
        )(idx)                                                       # (A,A-1)
        ally_feats = jax.vmap(lambda feats, o: feats[o])(
            ally_feats_full, order
        ).reshape(self.n_agents, -1)

        own = [(s.ally_hp / self.a_max_hp)[:, None]]
        if self.has_shields:
            own.append(
                jnp.where(
                    self.a_max_sh > 0,
                    s.ally_shield / jnp.maximum(self.a_max_sh, 1.0),
                    0.0,
                )[:, None]
            )
        if self.type_bits:
            own.append(self.a_type_oh)
        obs = jnp.concatenate([move_feats, enemy_feats, ally_feats] + own, axis=-1)
        return jnp.where(alive[:, None], obs, 0.0)  # dead agents see zeros

    # ------------------------------------------------------------------
    def _state(self, s: SmacState) -> chex.Array:
        center = jnp.array([MAP_SIZE / 2.0, MAP_SIZE / 2.0])
        ally = [
            (s.ally_hp / self.a_max_hp)[:, None],
            (s.ally_cd / self.a_cd)[:, None],
            (s.ally_pos - center) / (MAP_SIZE / 2.0),
        ]
        enemy = [
            (s.enemy_hp / self.e_max_hp)[:, None],
            (s.enemy_pos - center) / (MAP_SIZE / 2.0),
        ]
        if self.has_shields:
            ally.append(
                jnp.where(self.a_max_sh > 0,
                          s.ally_shield / jnp.maximum(self.a_max_sh, 1.0), 0.0)[:, None]
            )
            enemy.append(
                jnp.where(self.e_max_sh > 0,
                          s.enemy_shield / jnp.maximum(self.e_max_sh, 1.0), 0.0)[:, None]
            )
        if self.type_bits:
            ally.append(self.a_type_oh)
            enemy.append(self.e_type_oh)
        last = jax.nn.one_hot(s.last_action, self.n_actions).reshape(-1)
        return jnp.concatenate(
            [jnp.concatenate(ally, axis=-1).reshape(-1),
             jnp.concatenate(enemy, axis=-1).reshape(-1),
             last]
        )

    def _timestep(self, s, reward, done, truncated, won):
        avail = self._avail(s)           # computed once, shared with _obs
        return TimeStep(
            obs=self._obs(s, avail),
            state=self._state(s),
            avail=avail,
            reward=jnp.asarray(reward, jnp.float32),
            done=jnp.asarray(done, jnp.bool_),
            truncated=jnp.asarray(truncated, jnp.bool_),
            info={"battle_won": jnp.asarray(won, jnp.float32)},
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _apply_damage(hp, shield, dmg):
        """Shields absorb first; returns (hp', shield', total damage)."""
        absorbed = jnp.minimum(shield, dmg)
        shield2 = shield - absorbed
        spill = dmg - absorbed
        hp2 = jnp.clip(hp - spill, 0.0, None)
        dealt = (shield - shield2) + (hp - hp2)
        return hp2, shield2, dealt

    def _resolve_collisions(self, ally_pos, enemy_pos, ally_alive, enemy_alive):
        """Pairwise push-out so live units keep ≥2·UNIT_RADIUS separation.

        Two Jacobi relaxation passes over the combined (A+E) position
        block: every overlapping live pair moves each member half the
        overlap apart along the separation direction. Approximate
        simultaneous collision (SMAC's engine solves it exactly per
        frame, ENVS_FIDELITY.md S11); branchless and O(N²) with N ≤ ~60
        on the published maps. Dead units neither push nor get pushed.
        """
        pos = jnp.concatenate([ally_pos, enemy_pos], axis=0)          # (N,2)
        live = jnp.concatenate([ally_alive, enemy_alive], axis=0)     # (N,)
        n = pos.shape[0]
        pair = live[:, None] & live[None, :] & ~jnp.eye(n, dtype=bool)
        for _ in range(2):
            delta = pos[:, None, :] - pos[None, :, :]                 # (N,N,2)
            dist = jnp.linalg.norm(delta, axis=-1)
            overlap = jnp.maximum(2.0 * UNIT_RADIUS - dist, 0.0) * pair
            dirn = delta / jnp.maximum(dist, 1e-6)[..., None]
            pos = jnp.clip(
                pos + jnp.sum(dirn * (0.5 * overlap)[..., None], axis=1),
                0.5, MAP_SIZE - 0.5,
            )
        return pos[: self.n_agents], pos[self.n_agents:]

    def _step(self, s: SmacState, actions, key):
        alive = s.ally_hp > 0.0
        enemy_alive = s.enemy_hp > 0.0
        actions = jnp.where(alive, actions, 0)

        # ---- ally movement (explicit moves + attack-move) --------------
        is_move = (actions >= 2) & (actions < N_FIXED_ACTIONS)
        dir_idx = jnp.clip(actions - 2, 0, 3)
        step_vec = MOVE_DIRS[dir_idx] * self.a_move[:, None] * is_move[:, None]

        is_attack = actions >= N_FIXED_ACTIONS
        t_e = jnp.clip(actions - N_FIXED_ACTIONS, 0, self.n_enemies - 1)
        if self.ally_heals:
            # healer rows read the target block as ALLY indices (heal)
            t_a = jnp.clip(actions - N_FIXED_ACTIONS, 0, self.n_agents - 1)
            tgt_pos = jnp.where(
                self.a_heal[:, None], s.ally_pos[t_a], s.enemy_pos[t_e]
            )
            tgt_alive = jnp.where(
                self.a_heal, s.ally_hp[t_a] > 0.0, s.enemy_hp[t_e] > 0.0
            )
        else:
            tgt_pos = s.enemy_pos[t_e]
            tgt_alive = s.enemy_hp[t_e] > 0.0
        to_tgt = tgt_pos - s.ally_pos
        tgt_dist = jnp.linalg.norm(to_tgt, axis=-1)
        out_of_range = tgt_dist > self.a_rng
        # attack order out of weapon range → close distance (attack-move)
        approach = (
            is_attack & out_of_range & alive
        )[:, None] * to_tgt / jnp.maximum(tgt_dist, 1e-6)[:, None] \
            * self.a_move[:, None]
        ally_pos = jnp.clip(s.ally_pos + step_vec + approach, 0.5, MAP_SIZE - 0.5)

        # ---- ally attacks / heals ---------------------------------------
        dist_after = jnp.linalg.norm(ally_pos - tgt_pos, axis=-1)
        can_fire = (
            is_attack & alive & (s.ally_cd <= 0.0)
            & (dist_after <= self.a_rng) & tgt_alive
        )
        atk_fire = can_fire
        if self.ally_heals:
            atk_fire = can_fire & ~self.a_heal
            heal_out = jnp.zeros((self.n_agents,)).at[t_a].add(
                jnp.where(can_fire & self.a_heal, self.a_dmg, 0.0)
            )
        dmg_out = jnp.zeros((self.n_enemies,)).at[t_e].add(
            jnp.where(atk_fire, self.a_dmg, 0.0)
        )
        ally_cd = jnp.where(can_fire, self.a_cd, jnp.maximum(s.ally_cd - 1.0, 0.0))

        enemy_hp, enemy_shield, damage_dealt_vec = self._apply_damage(
            s.enemy_hp, s.enemy_shield, dmg_out
        )
        damage_dealt = jnp.sum(damage_dealt_vec)
        kills = jnp.sum(
            ((s.enemy_hp > 0.0) & (enemy_hp <= 0.0)).astype(jnp.float32)
        )
        # shield regen for undamaged live Protoss enemies
        enemy_shield = jnp.where(
            (dmg_out <= 0.0) & (enemy_hp > 0.0),
            jnp.minimum(enemy_shield + SHIELD_REGEN, self.e_max_sh),
            enemy_shield,
        )

        # ---- scripted enemy team: SC2-style attack-move ----------------
        # each enemy keeps its acquired target while that ally lives and
        # stays within sight (SC2 auto-attack persistence); it re-acquires
        # the ally nearest to itself otherwise, and closes distance when
        # out of weapon range. Decisions use the PRE-move ally positions —
        # the same snapshot the allies acted on (simultaneous-move
        # resolution, as in SMAC's 8-frame step); reacting to post-move
        # positions would hand the bot a free first volley at engagement
        # start (measured: it turns mirror 3m into a ~50% coin flip,
        # scripts/forensic_3m_scripted.py)
        enemy_alive2 = enemy_hp > 0.0
        dist_ea = jnp.linalg.norm(
            s.enemy_pos[:, None, :] - s.ally_pos[None, :, :], axis=-1
        )                                                            # (E,A)
        dist_masked = jnp.where(alive[None, :], dist_ea, jnp.inf)
        nearest = jnp.argmin(dist_masked, axis=-1)                   # (E,)
        nearest_dist = jnp.min(dist_masked, axis=-1)
        e_idx = jnp.arange(self.n_enemies)
        cur = jnp.clip(s.enemy_target, 0, self.n_agents - 1)
        cur_dist = dist_ea[e_idx, cur]
        # persistence has a short pursuit leash (weapon range + margin,
        # SC2's target-lock behavior): a focused ally that pulls back
        # redirects the enemy onto the next-nearest — the tanking
        # rotation SMAC policies exploit to hit ~95%+ win rates
        cur_valid = (
            (s.enemy_target >= 0) & alive[cur]
            & (cur_dist <= self.e_rng + PURSUE_MARGIN)
        )
        # acquisition only within sight range (SC2 target acquisition) —
        # an enemy never locks an ally it cannot see
        near_valid = nearest_dist <= SIGHT_RANGE
        has_target = cur_valid | near_valid
        target_a = jnp.where(cur_valid, cur, nearest)                # (E,)
        tgt_dist = dist_ea[e_idx, target_a]
        fire = (
            enemy_alive2 & has_target
            & (tgt_dist <= self.e_rng) & (s.enemy_cd <= 0.0)
        )
        if self.enemy_heals:
            fire = fire & ~self.e_heal
        dmg_in = jnp.zeros((self.n_agents,)).at[target_a].add(
            jnp.where(fire, self.e_dmg, 0.0)
        )
        shooting = fire
        if self.enemy_heals:
            # the bot's medivac follows the most damaged living teammate
            # (non-healer) and heals it when in range; with nobody hurt it
            # sticks with its nearest living teammate
            frac = enemy_hp / self.e_max_hp        # post-ally-damage health
            mate_ok = enemy_alive2 & ~self.e_heal
            damaged = mate_ok & (frac < 1.0)
            has_damaged = jnp.any(damaged)
            most_damaged = jnp.argmin(jnp.where(damaged, frac, jnp.inf))
            dist_ee = jnp.linalg.norm(
                s.enemy_pos[:, None, :] - s.enemy_pos[None, :, :], axis=-1
            )                                                        # (E,E)
            nearest_mate = jnp.argmin(
                jnp.where(mate_ok[None, :], dist_ee, jnp.inf), axis=-1
            )
            follow_tgt = jnp.where(has_damaged, most_damaged, nearest_mate)
            follow_pos = s.enemy_pos[follow_tgt]                     # (E,2)
            fdist = jnp.linalg.norm(follow_pos - s.enemy_pos, axis=-1)
            heal_fire = (
                self.e_heal & enemy_alive2 & has_damaged
                & (fdist <= self.e_rng) & (s.enemy_cd <= 0.0)
            )
            heal_in_e = jnp.zeros((self.n_enemies,)).at[follow_tgt].add(
                jnp.where(heal_fire, self.e_dmg, 0.0)
            )
            enemy_hp = jnp.where(
                enemy_hp > 0.0,
                jnp.minimum(enemy_hp + heal_in_e, self.e_max_hp),
                enemy_hp,
            )
            shooting = fire | heal_fire
        enemy_cd = jnp.where(
            shooting, self.e_cd, jnp.maximum(s.enemy_cd - 1.0, 0.0)
        )
        # movement: close on the acquired target when out of weapon range;
        # with no target, attack-move toward the ally spawn point (SMAC
        # launches the bot with an attack-move order across the map)
        spawn_dest = jnp.array([9.0, MAP_SIZE / 2.0])
        dest = jnp.where(
            has_target[:, None], s.ally_pos[target_a], spawn_dest[None, :]
        )
        no_tgt_move = ~has_target
        move_tgt_dist = tgt_dist
        if self.enemy_heals:
            # medivacs shadow their heal/follow teammate, not the allies
            dest = jnp.where(self.e_heal[:, None], follow_pos, dest)
            move_tgt_dist = jnp.where(self.e_heal, fdist, tgt_dist)
            has_target = has_target | self.e_heal
            no_tgt_move = ~has_target
        to_dest = dest - s.enemy_pos
        norm = jnp.linalg.norm(to_dest, axis=-1, keepdims=True) + 1e-8
        advance = enemy_alive2 & (
            (has_target & (move_tgt_dist > self.e_rng))
            | (no_tgt_move & (norm[:, 0] > self.e_move))
        )
        enemy_pos = jnp.clip(
            s.enemy_pos + to_dest / norm * self.e_move[:, None] * advance[:, None],
            0.5, MAP_SIZE - 0.5,
        )
        keep = enemy_alive2 & has_target
        if self.enemy_heals:
            keep = keep & ~self.e_heal   # healers re-pick every step
        enemy_target = jnp.where(keep, target_a, -1).astype(jnp.int32)
        ally_hp, ally_shield, _ = self._apply_damage(
            s.ally_hp, s.ally_shield, dmg_in
        )
        if self.ally_heals:
            # heals land on this step's survivors (no resurrection)
            ally_hp = jnp.where(
                ally_hp > 0.0,
                jnp.minimum(ally_hp + heal_out, self.a_max_hp),
                ally_hp,
            )
        ally_shield = jnp.where(
            (dmg_in <= 0.0) & (ally_hp > 0.0),
            jnp.minimum(ally_shield + SHIELD_REGEN, self.a_max_sh),
            ally_shield,
        )

        # ---- collisions (S11 opt-in) ----------------------------------
        if self.unit_collisions:
            ally_pos, enemy_pos = self._resolve_collisions(
                ally_pos, enemy_pos, ally_hp > 0.0, enemy_hp > 0.0
            )

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
            ally_shield=ally_shield,
            ally_cd=ally_cd,
            enemy_pos=enemy_pos,
            enemy_hp=enemy_hp,
            enemy_shield=enemy_shield,
            enemy_cd=enemy_cd,
            enemy_target=enemy_target,
            last_action=actions,
            t=t2,
        )
        return s2, self._timestep(s2, reward, done, truncated, won)


def _combat(n_allies: int, n_enemies: int, **kw) -> MicroCombat:
    return MicroCombat(["marine"] * n_allies, ["marine"] * n_enemies, **kw)


def make(map_name: str, time_limit: int = 150, **kwargs) -> Environment:
    m = re.fullmatch(r"(\d+)m", map_name)
    if m:
        n = int(m.group(1))
        return _combat(n, n, time_limit=time_limit, **kwargs)
    m = re.fullmatch(r"(\d+)m_vs_(\d+)m", map_name)
    if m:
        return _combat(int(m.group(1)), int(m.group(2)),
                       time_limit=time_limit, **kwargs)
    m = re.fullmatch(r"(\d+)s(\d+)z", map_name)
    if m:
        types = ["stalker"] * int(m.group(1)) + ["zealot"] * int(m.group(2))
        return MicroCombat(types, list(types), time_limit=time_limit, **kwargs)
    # SMAC's Terran bio-ball maps (medivac + marauders + marines)
    if map_name.upper() == "MMM":
        types = ["medivac"] + ["marauder"] * 2 + ["marine"] * 7
        return MicroCombat(types, list(types), time_limit=time_limit, **kwargs)
    if map_name.upper() == "MMM2":
        allies = ["medivac"] + ["marauder"] * 2 + ["marine"] * 7
        enemies = ["medivac"] + ["marauder"] * 3 + ["marine"] * 8
        return MicroCombat(allies, enemies, time_limit=time_limit, **kwargs)
    raise ValueError(
        f"unknown smaclite map {map_name!r}; supported: Nm (e.g. 3m, 8m), "
        f"Nm_vs_Mm (e.g. 5m_vs_6m), NsMz (e.g. 2s3z, 3s5z), MMM, MMM2"
    )
