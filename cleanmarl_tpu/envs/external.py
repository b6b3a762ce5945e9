"""Bridge host (Python) environments into the jitted trainers.

The reference runs one Python env per OS process over Pipes
(/root/reference/cleanmarl/vdn_multienvs.py:229-297). Here a batch of
host envs (e.g. real PettingZoo, ``envs/pettingzoo_host.py``) is
stepped from INSIDE the compiled training program through
``jax.experimental.io_callback``: the XLA program pauses at the env
boundary, the host steps all envs and auto-resets the finished ones,
and the arrays flow back into the on-device pipeline. Every algorithm
works unchanged — the same scanned rollouts, buffers and updates — the
env batch is just host-backed instead of pure-JAX.

Ordering is enforced (``ordered=True``) and a step-counter token
threads the data dependency through scans. Throughput is bounded by
the Python envs themselves (the reference has the same bound, plus
pickle/Pipe overhead); pure-JAX ports remain the fast path.

RNG: host envs are seeded from numpy on construction/auto-reset; the
device-side key argument is ignored (documented deviation — host
randomness cannot be folded into the JAX key system).

Info plumbing (round 4): a host env may return a 5th element from
``step`` — an info dict whose ``battle_won`` (float) and
``agent_rewards`` ((n_agents,) array, gated on the family's static
``provides_agent_rewards``) flow into the TimeStep info for both the
live and the pre-reset ``final`` views; 4-tuple envs keep the legacy
zero defaults.
"""
from __future__ import annotations

from typing import Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.types import TimeStep


class HostEnvFamily:
    """Static metadata + vec-env factory for a host env constructor.

    Duck-types the parts of ``Environment`` the algorithms read
    (n_agents/obs_dim/state_dim/n_actions/episode_limit) and provides
    ``make_vec`` used instead of ``VecEnv``.
    """

    def __init__(self, make_env: Callable[[], object], seed: int = 0):
        self._make_env = make_env
        probe = make_env()
        self.n_agents = probe.n_agents
        self.obs_dim = probe.obs_dim
        self.state_dim = probe.state_dim
        self.n_actions = probe.n_actions
        self.episode_limit = probe.episode_limit
        # host envs that report per-agent rewards (the reference's LBF
        # info["agent_rewards"], lbf.py:44-47) declare it statically so
        # the io_callback result shapes stay fixed
        self.provides_agent_rewards = bool(
            getattr(probe, "provides_agent_rewards", False)
        )
        probe.close()
        self._seed = seed

    def make_vec(self, num_envs: int, auto_reset: bool = True) -> "HostVecEnv":
        return HostVecEnv(self, num_envs, auto_reset=auto_reset)


class HostVecEnv:
    def __init__(self, family: HostEnvFamily, num_envs: int, auto_reset: bool = True):
        self.family = family
        self.num_envs = num_envs
        self.auto_reset = auto_reset
        self.n_agents = family.n_agents
        self.obs_dim = family.obs_dim
        self.state_dim = family.state_dim
        self.n_actions = family.n_actions
        self.episode_limit = family.episode_limit
        self.envs: List[object] = [family._make_env() for _ in range(num_envs)]
        self._rng = np.random.RandomState(family._seed)
        self._t = np.zeros(num_envs, np.int64)

        E, n, O, S, A = (
            num_envs, self.n_agents, self.obs_dim, self.state_dim, self.n_actions,
        )
        ts_struct = dict(
            obs=jax.ShapeDtypeStruct((E, n, O), jnp.float32),
            state=jax.ShapeDtypeStruct((E, S), jnp.float32),
            avail=jax.ShapeDtypeStruct((E, n, A), jnp.bool_),
            reward=jax.ShapeDtypeStruct((E,), jnp.float32),
            done=jax.ShapeDtypeStruct((E,), jnp.bool_),
            truncated=jax.ShapeDtypeStruct((E,), jnp.bool_),
            battle_won=jax.ShapeDtypeStruct((E,), jnp.float32),
        )
        if family.provides_agent_rewards:
            ts_struct["agent_rewards"] = jax.ShapeDtypeStruct(
                (E, n), jnp.float32
            )
        self._step_struct = (ts_struct, dict(ts_struct))

    # -- host side ------------------------------------------------------
    def _host_reset(self):
        obs, state, avail = [], [], []
        for i, env in enumerate(self.envs):
            o = env.reset(seed=int(self._rng.randint(0, 2**31 - 1)))
            self._t[i] = 0
            obs.append(o)
            state.append(env.get_state())
            avail.append(env.get_avail_actions())
        E, n = self.num_envs, self.n_agents
        d = dict(
            obs=np.stack(obs).astype(np.float32),
            state=np.stack(state).astype(np.float32),
            avail=np.stack(avail),
            reward=np.zeros(E, np.float32),
            done=np.zeros(E, bool),
            truncated=np.zeros(E, bool),
            battle_won=np.zeros(E, np.float32),
        )
        if self.family.provides_agent_rewards:
            d["agent_rewards"] = np.zeros((E, n), np.float32)
        return d

    def _host_step(self, actions):
        actions = np.asarray(actions)
        live, final = [], []
        for i, env in enumerate(self.envs):
            out = env.step(actions[i])
            # step protocol: (obs, reward, done, truncated[, info]) —
            # info carries battle_won / agent_rewards when the env has them
            obs, reward, done, truncated = out[:4]
            info = out[4] if len(out) > 4 else {}
            bw = float(info.get("battle_won", 0.0))
            ar = info.get("agent_rewards")
            if self.family.provides_agent_rewards and ar is None:
                raise ValueError(
                    "host env declares provides_agent_rewards but step() "
                    "returned no info['agent_rewards'] — the contract "
                    "requires it on EVERY step"
                )
            self._t[i] += 1
            if self._t[i] >= self.episode_limit and not done:
                truncated = True
            state = env.get_state()
            avail = env.get_avail_actions()
            final.append((obs, state, avail, reward, done, truncated, bw, ar))
            if self.auto_reset and (done or truncated):
                obs = env.reset(seed=int(self._rng.randint(0, 2**31 - 1)))
                self._t[i] = 0
                state = env.get_state()
                avail = env.get_avail_actions()
            live.append((obs, state, avail, reward, done, truncated, bw, ar))

        def pack(rows):
            obs, state, avail, reward, done, trunc, bw, ar = zip(*rows)
            d = dict(
                obs=np.stack(obs).astype(np.float32),
                state=np.stack(state).astype(np.float32),
                avail=np.stack(avail),
                reward=np.asarray(reward, np.float32),
                done=np.asarray(done, bool),
                truncated=np.asarray(trunc, bool),
                battle_won=np.asarray(bw, np.float32),
            )
            if self.family.provides_agent_rewards:
                d["agent_rewards"] = np.stack(ar).astype(np.float32)
            return d

        return pack(live), pack(final)

    # -- device side ----------------------------------------------------
    def _to_ts(self, d) -> TimeStep:
        info = {"battle_won": d["battle_won"]}
        if "agent_rewards" in d:
            info["agent_rewards"] = d["agent_rewards"]
        return TimeStep(
            obs=d["obs"], state=d["state"], avail=d["avail"],
            reward=d["reward"], done=d["done"], truncated=d["truncated"],
            info=info,
        )

    def reset(self, key):
        del key  # host RNG (see module docstring)
        d = jax.tree.map(jnp.asarray, self._host_reset())
        token = jnp.zeros((), jnp.int32)
        return token, self._to_ts(d)

    def step(self, state, actions, key):
        del key
        live, final = jax.experimental.io_callback(
            self._host_step, self._step_struct, actions, ordered=True
        )
        return state + 1, self._to_ts(live), self._to_ts(final)

    def sample(self, key, avail):
        logits = jnp.where(avail.astype(bool), 0.0, -jnp.inf)
        return jax.random.categorical(key, logits).astype(jnp.int32)

    def close(self):
        for env in self.envs:
            env.close()


def as_vec(env, num_envs: int, auto_reset: bool = True):
    """VecEnv for pure-JAX envs, HostVecEnv for host families."""
    if hasattr(env, "make_vec"):
        return env.make_vec(num_envs, auto_reset=auto_reset)
    from cleanmarl_tpu.envs.base import VecEnv

    return VecEnv(env, num_envs, auto_reset=auto_reset)
