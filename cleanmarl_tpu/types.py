"""Core pytree types shared across envs, buffers and algorithms.

The TimeStep layout is the on-device mirror of the reference's CTDE env
contract (/root/reference/cleanmarl/env/common_interface.py:5-23): per-agent
observations, a global state (for centralized critics / QMIX mixers),
per-agent action-availability masks, and a *team* scalar reward
(/root/reference/cleanmarl/env/pettingzoo_wrapper.py:66).
"""
from __future__ import annotations

from typing import Any, Dict

import chex
import jax.numpy as jnp


@chex.dataclass(frozen=True)
class TimeStep:
    """One environment step's outputs, batched over leading axes by vmap.

    Shapes (unbatched): obs (n_agents, obs_dim), state (state_dim,),
    avail (n_agents, n_actions) bool, reward () f32, done () bool,
    truncated () bool, info: dict of scalar f32 (e.g. battle_won).
    """

    obs: chex.Array
    state: chex.Array
    avail: chex.Array
    reward: chex.Array
    done: chex.Array
    truncated: chex.Array
    info: Dict[str, chex.Array]


def dummy_info() -> Dict[str, chex.Array]:
    return {}


@chex.dataclass(frozen=True)
class Transition:
    """A replay transition; team reward, shared done. Mirrors the tuple
    stored by the reference's flat ring buffer
    (/root/reference/cleanmarl/vdn.py:98-151)."""

    obs: chex.Array          # (n_agents, obs_dim)
    state: chex.Array        # (state_dim,)
    avail: chex.Array        # (n_agents, n_actions) bool
    action: chex.Array       # (n_agents,) int32
    reward: chex.Array       # () f32
    done: chex.Array         # () bool — terminal (not truncation)
    next_obs: chex.Array
    next_state: chex.Array
    next_avail: chex.Array


Params = Any
PyTree = Any


def f32(x) -> chex.Array:
    return jnp.asarray(x, jnp.float32)
