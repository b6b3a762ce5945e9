"""Pure-JAX SISL Pursuit (``pursuit_v4``) — TPU-speed port of the
reference's demonstrated PettingZoo scenario.

The reference's per-file Args suggest ``pursuit_v4`` as the canonical
PettingZoo alternative to SMAClite (vdn.py:21 ``"pursuit_v4"``,
README.md) and train it through PettingZooWrapper + one-env-per-process
Pipes. Here the full grid game runs as branchless vectorized JAX so the
env batch lives on-device; the host io_callback path
(envs/pettingzoo_host.py) remains available for exact-upstream runs.

Dynamics are a rule-for-rule port of the installed pettingzoo 1.26
implementation (pettingzoo/sisl/pursuit/pursuit_base.py — cross-checked
in tests/test_envs_pursuit.py against the real package, which IS
importable in-image):

- 16×16 grid with the centered rectangle building
  (two_d_maps.rectangle_map: x/16 ∈ (0.3, 0.7), y/16 ∈ (0.2, 0.8));
- actions [left, right, up, down, stay] = [[-1,0],[1,0],[0,1],[0,-1],
  [0,0]] (discrete_agent.py:33-39), moves blocked by bounds/building;
- AEC semantics of the parallel wrapper (pursuit.py raw_env.step +
  aec accumulation): pursuers move ONE AT A TIME; after each sub-move
  the tag reward ``0.01·(evaders in the 4-neighborhood, coords clipped
  into the grid)`` is evaluated for ALL pursuers, divided by
  n_pursuers, shared-averaged, and ACCUMULATED — so one parallel step
  earns the sum over the 8 sub-steps (pursuit_base.py:244-278);
- after the last sub-move: surround-captures (occupied catch positions
  == need_to_surround with its literal boundary/building quirks,
  pursuit_base.py:520-603), catch reward 5.0 to surrounding pursuers
  (shared-averaged), urgency −0.1, then surviving evaders each take an
  independent uniform random action with the same blocked-move rules;
- obs per pursuer: 7×7×3 window [walls(1 outside the grid, |building|
  inside), pursuer counts incl. self, alive evader counts], laid out
  exactly as upstream's ``np.swapaxes((3,R,R), 2, 0)`` then flattened
  (PettingZooWrapper flattening, pettingzoo_wrapper.py:30-32);
- CTDE contract per the reference wrapper: state = concat of all
  pursuer obs (:95), team reward = rewards[0] (all equal under
  shared_reward, :66), all 5 actions always available;
- termination when every evader is caught; truncation at max_cycles.

Spawn follows the upstream rules (uniform over non-building cells,
rejecting cells on/orthogonally-adjacent to already-placed agents of
the same group, agent_utils.feasible_position_exp) — the realized
distribution differs from numpy's rejection sequence (documented
distributional delta, ENVS_FIDELITY.md §5).
"""
from __future__ import annotations

import chex
import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.envs.base import Environment
from cleanmarl_tpu.types import TimeStep

# eactions order [left, right, up, down, stay] (discrete_agent.py:33-39);
# x is the FIRST grid dimension upstream
MOTION = np.array([[-1, 0], [1, 0], [0, 1], [0, -1], [0, 0]], np.int32)
# 4-neighborhood used for tags and surround captures (pursuit_base.py:155)
SURROUND = np.array([[-1, 0], [1, 0], [0, 1], [0, -1]], np.int32)


def rectangle_map(xs: int, ys: int, xb: float = 0.3, yb: float = 0.2):
    """two_d_maps.rectangle_map: 1 where the centered building sits."""
    xi = np.arange(xs, dtype=np.float64) / xs
    yi = np.arange(ys, dtype=np.float64) / ys
    bx = (xi > xb) & (xi < 1.0 - xb)
    by = (yi > yb) & (yi < 1.0 - yb)
    return (bx[:, None] & by[None, :]).astype(np.float32)


@chex.dataclass(frozen=True)
class PursuitState:
    ppos: chex.Array    # (P, 2) int32
    epos: chex.Array    # (E, 2) int32
    ealive: chex.Array  # (E,) bool
    t: chex.Array       # () int32


class Pursuit(Environment):
    def __init__(
        self,
        x_size: int = 16,
        y_size: int = 16,
        n_evaders: int = 30,
        n_pursuers: int = 8,
        obs_range: int = 7,
        n_catch: int = 2,
        freeze_evaders: bool = False,
        tag_reward: float = 0.01,
        catch_reward: float = 5.0,
        urgency_reward: float = -0.1,
        surround: bool = True,
        time_limit: int = 500,
    ):
        self.x_size, self.y_size = x_size, y_size
        self.n_evaders, self.n_pursuers = n_evaders, n_pursuers
        self.obs_range = obs_range
        self.obs_offset = (obs_range - 1) // 2
        self.n_catch = n_catch
        self.freeze_evaders = freeze_evaders
        self.tag_reward = tag_reward
        self.catch_reward = catch_reward
        self.urgency_reward = urgency_reward
        self.surround = surround
        self.building = jnp.asarray(rectangle_map(x_size, y_size))  # (X, Y)

        self.n_agents = n_pursuers
        self.n_actions = 5
        self.obs_dim = obs_range * obs_range * 3
        self.state_dim = self.obs_dim * n_pursuers
        self.episode_limit = time_limit

        # static per-cell need_to_surround with upstream's literal rules
        # (pursuit_base.py:585-603): 4, minus 1 per x/y border, minus
        # building neighbors — where the neighbor-bounds check is the
        # STRICT 0 < xn < X (so border-adjacent coords skip the check)
        X, Y = x_size, y_size
        need = np.full((X, Y), 4, np.int32)
        bmap = rectangle_map(x_size, y_size)
        for x in range(X):
            for y in range(Y):
                if x in (0, X - 1):
                    need[x, y] -= 1
                if y in (0, Y - 1):
                    need[x, y] -= 1
                for dx, dy in SURROUND:
                    xn, yn = x + dx, y + dy
                    if not 0 < xn < X or not 0 < yn < Y:
                        continue
                    if bmap[xn, yn] == 1.0:
                        need[x, y] -= 1
        self.need_to_surround = jnp.asarray(need)

        # conservative spawn-feasibility guard: each placement blocks at
        # most 5 cells of its group's free mask; exhaustion would make
        # the masked categorical silently return an arbitrary cell
        # (upstream's rejection sampler would loop forever instead)
        open_cells = x_size * y_size - int(rectangle_map(x_size, y_size).sum())
        for group, n in (("n_pursuers", n_pursuers), ("n_evaders", n_evaders)):
            if n * 5 > open_cells:
                raise ValueError(
                    f"{group}={n} may exhaust the {open_cells} open cells "
                    f"(conservative bound: 5 cells blocked per agent)"
                )

        # walls channel, pre-padded for window extraction: 1 outside the
        # grid (collect_obs_by_idx fills obs[0] with 1), |map| inside
        off = self.obs_offset
        walls = np.ones((X + 2 * off, Y + 2 * off), np.float32)
        walls[off:off + X, off:off + Y] = bmap
        self._walls_padded = jnp.asarray(walls)

    # -- helpers --------------------------------------------------------
    def _blocked_move(self, pos, action):
        """pos (..., 2) int32, action (...,) int32 → new pos; bounds and
        building both cancel the move (discrete_agent.py:66-96)."""
        delta = jnp.asarray(MOTION)[action]
        cand = pos + delta
        inb = (
            (cand[..., 0] >= 0) & (cand[..., 0] < self.x_size)
            & (cand[..., 1] >= 0) & (cand[..., 1] < self.y_size)
        )
        safe = jnp.clip(cand, 0, jnp.asarray(
            [self.x_size - 1, self.y_size - 1], jnp.int32))
        in_building = self.building[safe[..., 0], safe[..., 1]] > 0.0
        ok = inb & ~in_building
        return jnp.where(ok[..., None], cand, pos)

    def _count_grid(self, pos, alive=None):
        """Scatter (N, 2) int positions → (X, Y) float counts."""
        w = jnp.ones(pos.shape[0], jnp.float32) if alive is None \
            else alive.astype(jnp.float32)
        return jnp.zeros((self.x_size, self.y_size), jnp.float32).at[
            pos[:, 0], pos[:, 1]
        ].add(w)

    def _tags(self, ppos, egrid):
        """Per-pursuer evader count over the CLIPPED 4-neighborhood
        (pursuit_base.py reward(): coords clipped into the grid, so
        border cells can double-count — replicated)."""
        nb = ppos[:, None, :] + jnp.asarray(SURROUND)[None, :, :]  # (P,4,2)
        nb = jnp.clip(nb, 0, jnp.asarray(
            [self.x_size - 1, self.y_size - 1], jnp.int32))
        return jnp.sum(egrid[nb[..., 0], nb[..., 1]], axis=1)      # (P,)

    def _spawn_group(self, key, n):
        """Sequential masked uniform spawn: non-building cells, not
        on/orthogonally-adjacent to already-placed group members
        (agent_utils.feasible_position_exp + expanded_mat)."""
        X, Y = self.x_size, self.y_size
        free0 = (self.building.reshape(-1) == 0.0)

        def place(carry, k):
            free, key = carry
            key, kk = jax.random.split(key)
            logits = jnp.where(free, 0.0, -jnp.inf)
            # if ``free`` ever exhausts, categorical over all -inf logits
            # returns an arbitrary cell SILENTLY — the 5-cells-per-agent
            # constructor guard (below, __init__) is what keeps this
            # unreachable; loosen that bound only with a check here
            cell = jax.random.categorical(kk, logits)
            x, y = cell // Y, cell % Y
            nb = jnp.stack([x, y])[None, :] + jnp.concatenate(
                [jnp.zeros((1, 2), jnp.int32), jnp.asarray(SURROUND)], 0
            )
            nb = jnp.clip(nb, 0, jnp.asarray([X - 1, Y - 1], jnp.int32))
            free = free.at[nb[:, 0] * Y + nb[:, 1]].set(False)
            return (free, key), jnp.stack([x, y]).astype(jnp.int32)

        (_, _), pos = jax.lax.scan(place, (free0, key), jnp.arange(n))
        return pos

    # -- Environment API ------------------------------------------------
    def _reset(self, key: chex.PRNGKey):
        kp, ke = jax.random.split(key)
        state = PursuitState(
            ppos=self._spawn_group(kp, self.n_pursuers),
            epos=self._spawn_group(ke, self.n_evaders),
            ealive=jnp.ones(self.n_evaders, bool),
            t=jnp.zeros((), jnp.int32),
        )
        return state, self._timestep(state, 0.0, False, False)

    def _step(self, state: PursuitState, actions, key):
        P = self.n_pursuers
        egrid = self._count_grid(state.epos, state.ealive)

        # --- sequential pursuer sub-moves with AEC tag accumulation ---
        def sub(carry, k):
            ppos, acc = carry
            moved = self._blocked_move(ppos[k], actions[k])
            ppos = ppos.at[k].set(moved)
            shared = jnp.sum(self._tags(ppos, egrid)) * self.tag_reward / (P * P)
            return (ppos, acc + shared), None

        (ppos, reward), _ = jax.lax.scan(
            sub, (state.ppos, jnp.zeros(())), jnp.arange(P)
        )

        # --- captures after the last sub-move -------------------------
        pgrid = self._count_grid(ppos)
        enb = state.epos[:, None, :] + jnp.asarray(SURROUND)[None, :, :]
        enb_inb = (
            (enb[..., 0] >= 0) & (enb[..., 0] < self.x_size)
            & (enb[..., 1] >= 0) & (enb[..., 1] < self.y_size)
        )                                                       # (E, 4)
        enb_safe = jnp.clip(enb, 0, jnp.asarray(
            [self.x_size - 1, self.y_size - 1], jnp.int32))
        occ = enb_inb & (pgrid[enb_safe[..., 0], enb_safe[..., 1]] > 0.0)
        if self.surround:
            caught = state.ealive & (
                jnp.sum(occ, axis=1)
                == self.need_to_surround[state.epos[:, 0], state.epos[:, 1]]
            )
            # pursuer i surrounds: sits on an occupied catch position of
            # a caught evader (pursuit_base.py:552-559)
            same_cell = jnp.all(
                ppos[:, None, None, :] == enb_safe[None, :, :, :], axis=-1
            )                                                   # (P, E, 4)
            purs_sur = jnp.any(
                same_cell & (caught[None, :, None] & occ[None, :, :]), axis=(1, 2)
            )
        else:
            at_e = pgrid[state.epos[:, 0], state.epos[:, 1]]
            caught = state.ealive & (at_e >= self.n_catch)
            purs_sur = jnp.any(
                jnp.all(ppos[:, None, :] == state.epos[None, :, :], axis=-1)
                & caught[None, :], axis=1
            )
        reward = reward + (
            self.catch_reward * jnp.sum(purs_sur.astype(jnp.float32)) / P
            + self.urgency_reward
        )
        ealive = state.ealive & ~caught

        # --- evader random walk (after removal) -----------------------
        if not self.freeze_evaders:
            ea = jax.random.randint(key, (self.n_evaders,), 0, self.n_actions)
            epos = self._blocked_move(state.epos, ea)
        else:
            epos = state.epos

        t2 = state.t + 1
        done = ~jnp.any(ealive)
        truncated = (t2 >= self.episode_limit) & ~done
        s2 = PursuitState(ppos=ppos, epos=epos, ealive=ealive, t=t2)
        return s2, self._timestep(s2, reward, done, truncated)

    def _timestep(self, state, reward, done, truncated):
        obs = self._observe(state)
        return TimeStep(
            obs=obs,
            state=obs.reshape(-1),
            avail=jnp.ones((self.n_pursuers, self.n_actions), bool),
            reward=jnp.asarray(reward, jnp.float32),
            done=jnp.asarray(done, bool),
            truncated=jnp.asarray(truncated, bool),
            info={"battle_won": jnp.zeros((), jnp.float32)},
        )

    def _observe(self, state):
        """(P, obs_dim) flattened 7×7×3 windows in upstream layout."""
        off = self.obs_offset
        R = self.obs_range
        pad = ((off, off), (off, off))
        allies = jnp.pad(self._count_grid(state.ppos), pad)
        evaders = jnp.pad(self._count_grid(state.epos, state.ealive), pad)
        stacked = jnp.stack([self._walls_padded, allies, evaders])  # (3,X',Y')

        def window(p):
            w = jax.lax.dynamic_slice(stacked, (0, p[0], p[1]), (3, R, R))
            # upstream: np.swapaxes((3, R, R), 2, 0) → out[yw, xw, c]
            return jnp.transpose(w, (2, 1, 0)).reshape(-1)

        return jax.vmap(window)(state.ppos)
