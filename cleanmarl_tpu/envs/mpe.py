"""Pure-JAX Multi-agent Particle Environments (MPE).

TPU-native port of the scenarios the reference trains on through
``PettingZooWrapper`` (/root/reference/cleanmarl/env/pettingzoo_wrapper.py;
configs at /root/repo/BASELINE.md): ``simple_spread_v3`` and
``simple_speaker_listener_v4``. The installed pettingzoo (1.26.1) has
dropped the MPE family (moved to the separate ``mpe2`` wheel, not
available here), so this module re-implements the published MPE
core dynamics (openai/multiagent-particle-envs ``core.py`` /
``environment.py``, as vendored by pettingzoo-mpe) directly as
branchless vectorized JAX:

- integrator: ``v ← v·(1−damping) + (F/m)·dt``, ``x ← x + v·dt`` with
  dt=0.1, damping=0.25, mass=1;
- discrete action → force: one-hot index {1:+x, 2:−x, 3:+y, 4:−y}
  scaled by sensitivity/accel 5.0;
- soft collision forces between collidable entities:
  ``penetration = softplus(−(dist−dist_min)/k)·k`` with
  contact_force=100, contact_margin=1e-3, equal and opposite.

CTDE contract matches the reference wrapper: obs stacked per agent
(heterogeneous obs zero-padded to the longest, pettingzoo_wrapper.py
``longest_observation_space`` :30-32), global state = concat of obs
(:95), team reward = agent 0's reward (:66), avail masks pad
heterogeneous action spaces to the longest (:86-90), episodes always
truncate at ``max_cycles`` (MPE never terminates).
"""
from __future__ import annotations

import chex
import jax
import jax.numpy as jnp

from cleanmarl_tpu.envs.base import Environment
from cleanmarl_tpu.types import TimeStep

DT = 0.1
DAMPING = 0.25
SENSITIVITY = 5.0
CONTACT_FORCE = 1e2
CONTACT_MARGIN = 1e-3


def action_force(actions: chex.Array, n_actions: int = 5) -> chex.Array:
    """Discrete action index → 2D control force (pre-sensitivity).

    Mapping follows MPE's one-hot branch (environment.py ``_set_action``):
    u_x = onehot[1] − onehot[2], u_y = onehot[3] − onehot[4].
    actions: (..., ) int32 → (..., 2) f32.
    """
    onehot = jax.nn.one_hot(actions, n_actions)
    ux = onehot[..., 1] - onehot[..., 2]
    uy = onehot[..., 3] - onehot[..., 4]
    return jnp.stack([ux, uy], axis=-1) * SENSITIVITY


def collision_forces(pos: chex.Array, sizes: chex.Array, collide: chex.Array):
    """Pairwise soft-contact forces among collidable entities.

    pos (E, 2), sizes (E,), collide (E,) bool → forces (E, 2).
    """
    delta = pos[:, None, :] - pos[None, :, :]              # (E, E, 2)
    dist = jnp.sqrt(jnp.sum(jnp.square(delta), axis=-1) + 1e-12)
    dist_min = sizes[:, None] + sizes[None, :]
    k = CONTACT_MARGIN
    penetration = jax.nn.softplus(-(dist - dist_min) / k) * k
    pair = collide[:, None] & collide[None, :]
    pair = pair & ~jnp.eye(pos.shape[0], dtype=bool)
    mag = jnp.where(pair, CONTACT_FORCE * penetration, 0.0)
    direction = delta / dist[..., None]
    return jnp.sum(direction * mag[..., None], axis=1)      # force ON entity i


def integrate(pos, vel, force, movable, max_speed=None):
    """MPE core.integrate_state. pos/vel/force (E,2), movable (E,) bool."""
    vel = vel * (1.0 - DAMPING) + force * DT
    if max_speed is not None:
        speed = jnp.sqrt(jnp.sum(jnp.square(vel), axis=-1, keepdims=True) + 1e-12)
        vel = jnp.where(speed > max_speed, vel / speed * max_speed, vel)
    vel = vel * movable[:, None]
    pos = pos + vel * DT
    return pos, vel


@chex.dataclass(frozen=True)
class MPEState:
    agent_pos: chex.Array     # (n_agents, 2)
    agent_vel: chex.Array     # (n_agents, 2)
    landmark_pos: chex.Array  # (n_landmarks, 2)
    comm: chex.Array          # (n_agents, c_dim) communication state
    goal: chex.Array          # () int32 — scenario-specific (unused → 0)
    t: chex.Array             # () int32


class SimpleSpread(Environment):
    """``simple_spread_v3``: N agents must cover N landmarks.

    Rewards (scenario ``simple_spread.py``): global −Σ_l min_a d(a,l)
    blended with per-agent collision penalty −1 per colliding other
    agent: r_i = (1−local_ratio)·global + local_ratio·local_i. The team
    reward is r_0 (pettingzoo_wrapper.py:66). Obs (18 dims for N=3):
    [self_vel, self_pos, landmark_rel ×N, other_rel ×(N−1),
    other_comm ×(N−1)·c_dim] with c_dim=2 and comm always zero (no
    communication channel in this scenario).
    """

    def __init__(self, n_agents: int = 3, local_ratio: float = 0.5,
                 max_cycles: int = 25):
        self.n_agents = n_agents
        self.n_landmarks = n_agents
        self.local_ratio = local_ratio
        self.episode_limit = max_cycles
        self.n_actions = 5
        self.c_dim = 2
        self.agent_size = 0.15
        self.landmark_size = 0.05
        self.obs_dim = 2 + 2 + 2 * self.n_landmarks + 2 * (n_agents - 1) \
            + self.c_dim * (n_agents - 1)
        self.state_dim = self.obs_dim * n_agents

    # -- helpers --------------------------------------------------------
    def _obs(self, s: MPEState) -> chex.Array:
        def per_agent(i):
            rel_lm = (s.landmark_pos - s.agent_pos[i]).reshape(-1)
            order = jnp.delete(
                jnp.arange(self.n_agents), i, assume_unique_indices=True
            )
            rel_other = (s.agent_pos[order] - s.agent_pos[i]).reshape(-1)
            other_comm = s.comm[order].reshape(-1)
            return jnp.concatenate(
                [s.agent_vel[i], s.agent_pos[i], rel_lm, rel_other, other_comm]
            )

        return jnp.stack([per_agent(i) for i in range(self.n_agents)])

    def _timestep(self, s: MPEState, reward, done, truncated) -> TimeStep:
        obs = self._obs(s)
        return TimeStep(
            obs=obs,
            state=obs.reshape(-1),
            avail=jnp.ones((self.n_agents, self.n_actions), jnp.bool_),
            reward=jnp.asarray(reward, jnp.float32),
            done=jnp.asarray(done, jnp.bool_),
            truncated=jnp.asarray(truncated, jnp.bool_),
            info={"battle_won": jnp.zeros((), jnp.float32)},
        )

    def _reset(self, key):
        ka, kl = jax.random.split(key)
        s = MPEState(
            agent_pos=jax.random.uniform(ka, (self.n_agents, 2), minval=-1.0, maxval=1.0),
            agent_vel=jnp.zeros((self.n_agents, 2)),
            landmark_pos=jax.random.uniform(kl, (self.n_landmarks, 2), minval=-0.9, maxval=0.9),
            comm=jnp.zeros((self.n_agents, self.c_dim)),
            goal=jnp.zeros((), jnp.int32),
            t=jnp.zeros((), jnp.int32),
        )
        return s, self._timestep(s, 0.0, False, False)

    def _step(self, s: MPEState, actions, key):
        u = action_force(actions, self.n_actions)
        pos = jnp.concatenate([s.agent_pos, s.landmark_pos])
        sizes = jnp.concatenate(
            [jnp.full((self.n_agents,), self.agent_size),
             jnp.full((self.n_landmarks,), self.landmark_size)]
        )
        collide = jnp.concatenate(
            [jnp.ones((self.n_agents,), bool), jnp.zeros((self.n_landmarks,), bool)]
        )
        forces = collision_forces(pos, sizes, collide)
        agent_force = forces[: self.n_agents] + u
        movable = jnp.ones((self.n_agents,), bool)
        agent_pos, agent_vel = integrate(s.agent_pos, s.agent_vel, agent_force, movable)
        t2 = s.t + 1
        s2 = s.replace(agent_pos=agent_pos, agent_vel=agent_vel, t=t2)

        # rewards
        d = jnp.sqrt(
            jnp.sum(
                jnp.square(agent_pos[:, None, :] - s.landmark_pos[None, :, :]),
                axis=-1,
            )
        )  # (n_agents, n_landmarks)
        global_rew = -jnp.sum(jnp.min(d, axis=0))
        da = jnp.sqrt(
            jnp.sum(jnp.square(agent_pos[:, None, :] - agent_pos[None, :, :]), axis=-1)
            + 1e-12
        )
        coll = (da < 2 * self.agent_size) & ~jnp.eye(self.n_agents, dtype=bool)
        local_rew0 = -jnp.sum(coll[0].astype(jnp.float32))
        reward = (1.0 - self.local_ratio) * global_rew + self.local_ratio * local_rew0
        truncated = t2 >= self.episode_limit
        return s2, self._timestep(s2, reward, False, truncated)


class SimpleSpeakerListener(Environment):
    """``simple_speaker_listener_v4``: a static speaker sees which of 3
    colored landmarks is the listener's goal and "says" one of 3
    symbols; the mobile listener hears the symbol and must reach the
    goal. Cooperative reward = −‖listener − goal‖² for both agents.

    Agent order [speaker, listener] (scenario file order). Action
    spaces are heterogeneous — speaker Discrete(3), listener
    Discrete(5) — padded to 5 with avail masks exactly like the
    reference wrapper (pettingzoo_wrapper.py:86-90). Obs are
    heterogeneous — speaker (3,) = goal color, listener (11,) =
    [self_vel, landmark_rel ×3, comm(3)] — zero-padded to 11.

    Physics: only the listener moves; nothing collides. The speaker's
    utterance becomes the communication state on the NEXT step's
    listener obs (MPE updates comm in world.step after movement).
    """

    def __init__(self, max_cycles: int = 25):
        self.n_agents = 2
        self.n_landmarks = 3
        self.episode_limit = max_cycles
        self.n_actions = 5          # padded; speaker really has 3
        self.c_dim = 3
        self.obs_dim = 11           # max(3, 11)
        self.state_dim = self.obs_dim * 2
        self.landmark_size = 0.04
        self.listener_size = 0.075

    def _obs(self, s: MPEState) -> chex.Array:
        goal_color = jax.nn.one_hot(s.goal, 3) * 0.75  # landmark colors ±
        speaker_obs = jnp.concatenate([goal_color, jnp.zeros((self.obs_dim - 3,))])
        listener_pos = s.agent_pos[1]
        rel_lm = (s.landmark_pos - listener_pos).reshape(-1)
        listener_obs = jnp.concatenate([s.agent_vel[1], rel_lm, s.comm[0]])
        return jnp.stack([speaker_obs, listener_obs])

    def _avail(self):
        return jnp.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.bool_)

    def _timestep(self, s, reward, truncated):
        obs = self._obs(s)
        return TimeStep(
            obs=obs,
            state=obs.reshape(-1),
            avail=self._avail(),
            reward=jnp.asarray(reward, jnp.float32),
            done=jnp.zeros((), jnp.bool_),
            truncated=jnp.asarray(truncated, jnp.bool_),
            info={"battle_won": jnp.zeros((), jnp.float32)},
        )

    def _reset(self, key):
        kg, ka, kl = jax.random.split(key, 3)
        s = MPEState(
            agent_pos=jax.random.uniform(ka, (2, 2), minval=-1.0, maxval=1.0),
            agent_vel=jnp.zeros((2, 2)),
            landmark_pos=jax.random.uniform(kl, (3, 2), minval=-0.9, maxval=0.9),
            comm=jnp.zeros((1, self.c_dim)),   # speaker's channel
            goal=jax.random.randint(kg, (), 0, 3),
            t=jnp.zeros((), jnp.int32),
        )
        return s, self._timestep(s, 0.0, False)

    def _step(self, s: MPEState, actions, key):
        # listener movement (agent index 1); speaker is immobile
        u = action_force(actions[1], self.n_actions)
        vel = s.agent_vel[1] * (1.0 - DAMPING) + u * DT
        pos = s.agent_pos[1] + vel * DT
        agent_pos = s.agent_pos.at[1].set(pos)
        agent_vel = s.agent_vel.at[1].set(vel)
        # speaker utterance (clip padded actions 3/4 → one-hot of 0..2)
        say = jnp.clip(actions[0], 0, self.c_dim - 1)
        comm = jax.nn.one_hot(say, self.c_dim)[None, :]
        t2 = s.t + 1
        s2 = s.replace(agent_pos=agent_pos, agent_vel=agent_vel, comm=comm, t=t2)
        goal_pos = s.landmark_pos[s.goal]
        reward = -jnp.sum(jnp.square(pos - goal_pos))
        return s2, self._timestep(s2, reward, t2 >= self.episode_limit)


class SimpleReference(Environment):
    """``simple_reference_v3``: 2 mobile agents, 3 colored landmarks.

    Each agent privately observes the goal landmark the OTHER agent
    must reach (upstream ``simple_reference.py`` reset: ``goal_a`` =
    the other agent, ``goal_b`` = a random landmark) and can both move
    and "say" one of ``dim_c=10`` symbols. The speaker-listener task in
    both directions at once — the canonical MPE referential game.

    PettingZoo parity notes (wheel absent in-image; built to the
    published scenario/simple_env code):

    - action space Discrete(50): combined movement × communication,
      decoded exactly as ``simple_env._execute_world_step`` does —
      ``move = a % 5``, ``say = a // 5``.
    - obs (21,) per agent: [self_vel(2), landmark_rel(6),
      goal_color(3), other_comm(10)]; goal colors are the landmark
      colors 0.25 + 0.5·onehot(goal).
    - reward (``local_ratio=0.5``): 0.5·local_i + 0.5·mean_j(local_j)
      with local_i = −‖goal_a_i − goal_b_i‖² = −dist²(other agent,
      its assigned landmark); the CTDE team reward is agent 0's
      (pettingzoo_wrapper.py:66).
    - agents don't collide (upstream ``agent.collide = False``);
      utterances land on the next step's obs (world.step order).
    """

    def __init__(self, max_cycles: int = 25, local_ratio: float = 0.5):
        self.n_agents = 2
        self.n_landmarks = 3
        self.episode_limit = max_cycles
        self.local_ratio = local_ratio
        self.c_dim = 10
        self.n_move = 5
        self.n_actions = self.n_move * self.c_dim     # Discrete(50)
        self.obs_dim = 2 + 2 * self.n_landmarks + 3 + self.c_dim
        self.state_dim = self.obs_dim * self.n_agents

    def _obs(self, s: MPEState) -> chex.Array:
        # goal matrix: goal[i] = landmark the OTHER agent must reach,
        # observed by agent i
        goal_color = 0.25 + 0.5 * jax.nn.one_hot(s.goal, self.n_landmarks)

        def per_agent(i):
            rel_lm = (s.landmark_pos - s.agent_pos[i]).reshape(-1)
            other_comm = s.comm[1 - i]
            return jnp.concatenate(
                [s.agent_vel[i], rel_lm, goal_color[i], other_comm]
            )

        return jnp.stack([per_agent(0), per_agent(1)])

    def _timestep(self, s, reward, truncated):
        obs = self._obs(s)
        return TimeStep(
            obs=obs,
            state=obs.reshape(-1),
            avail=jnp.ones((self.n_agents, self.n_actions), jnp.bool_),
            reward=jnp.asarray(reward, jnp.float32),
            done=jnp.zeros((), jnp.bool_),
            truncated=jnp.asarray(truncated, jnp.bool_),
            info={"battle_won": jnp.zeros((), jnp.float32)},
        )

    def _reset(self, key):
        kg, ka, kl = jax.random.split(key, 3)
        s = MPEState(
            agent_pos=jax.random.uniform(ka, (2, 2), minval=-1.0, maxval=1.0),
            agent_vel=jnp.zeros((2, 2)),
            landmark_pos=jax.random.uniform(kl, (3, 2), minval=-1.0, maxval=1.0),
            comm=jnp.zeros((2, self.c_dim)),
            goal=jax.random.randint(kg, (2,), 0, self.n_landmarks),
            t=jnp.zeros((), jnp.int32),
        )
        return s, self._timestep(s, 0.0, False)

    def _step(self, s: MPEState, actions, key):
        move = actions % self.n_move
        say = actions // self.n_move
        u = action_force(move, self.n_move)                   # (2, 2)
        movable = jnp.ones((2,), bool)
        agent_pos, agent_vel = integrate(s.agent_pos, s.agent_vel, u, movable)
        comm = jax.nn.one_hot(say, self.c_dim)                # (2, c_dim)
        t2 = s.t + 1
        s2 = s.replace(
            agent_pos=agent_pos, agent_vel=agent_vel, comm=comm, t=t2
        )
        # local_i = −dist²(other agent, the landmark agent i assigned it)
        other = jnp.array([1, 0])
        local = -jnp.sum(
            jnp.square(agent_pos[other] - s.landmark_pos[s.goal]), axis=-1
        )                                                      # (2,)
        reward = (
            self.local_ratio * local[0]
            + (1.0 - self.local_ratio) * jnp.mean(local)
        )
        return s2, self._timestep(s2, reward, t2 >= self.episode_limit)


def make(env_name: str, **kwargs) -> Environment:
    name = env_name.lower()
    if name.startswith("simple_spread"):
        return SimpleSpread(**kwargs)
    if name.startswith("simple_speaker_listener"):
        return SimpleSpeakerListener(**kwargs)
    if name.startswith("simple_reference"):
        return SimpleReference(**kwargs)
    raise ValueError(
        f"unknown MPE scenario {env_name!r}; available: simple_spread_v3, "
        f"simple_speaker_listener_v4, simple_reference_v3"
    )
