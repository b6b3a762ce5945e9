"""HBM episode replay: fixed-length padded episode ring + on-device
episode assembly from auto-reset env streams.

TPU-native replacement for the reference's list-of-episode-dicts replay
(/root/reference/cleanmarl/qmix.py:126-205): instead of variable-length
Python lists padded at sample time (a recompile hazard, the reference's
JAX port re-pads to the *batch max* length, qmix_jax.py:190-191), every
episode slot is preallocated at ``T_max = episode_limit`` with an integer
``length``; sampling gathers fixed shapes and derives the boolean step
mask — no dynamic shapes, one compilation.

``EpisodeAccumulator`` replaces the reference's "alive-envs" episode
collection (qmix_multienvs.py:423-472): each vectorized env writes its
in-progress episode at [env, t]; when an env finishes, the completed
episode is scattered into the ring (with a scratch slot absorbing
non-finished writes) and the env's row restarts at t=0 — all inside jit.
"""
from __future__ import annotations

from typing import Any, Tuple

import chex
import jax
import jax.numpy as jnp


@chex.dataclass(frozen=True)
class EpisodeBuffer:
    """Leaves of ``data`` have shape (capacity + 1, T_max, ...); row
    ``capacity`` is a scratch slot that absorbs writes from envs whose
    episodes did not finish this step."""

    data: Any
    length: chex.Array  # (capacity + 1,) int32
    cursor: chex.Array  # () int32
    size: chex.Array    # () int32

    @property
    def capacity(self) -> int:
        return jax.tree.leaves(self.data)[0].shape[0] - 1

    @property
    def t_max(self) -> int:
        return jax.tree.leaves(self.data)[0].shape[1]

    @staticmethod
    def create(capacity: int, t_max: int, example: Any) -> "EpisodeBuffer":
        data = jax.tree.map(
            lambda x: jnp.zeros(
                (capacity + 1, t_max) + jnp.shape(x), jnp.asarray(x).dtype
            ),
            example,
        )
        return EpisodeBuffer(
            data=data,
            length=jnp.zeros((capacity + 1,), jnp.int32),
            cursor=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    def sample(self, key: chex.PRNGKey, batch_size: int):
        """→ (records (B, T_max, ...), mask (B, T_max) f32).

        Uniform over stored episodes (qmix.py:155-160)."""
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        batch = jax.tree.map(lambda buf: buf[idx], self.data)
        lengths = self.length[idx]
        mask = (jnp.arange(self.t_max)[None, :] < lengths[:, None]).astype(jnp.float32)
        return batch, mask


@chex.dataclass(frozen=True)
class EpisodeAccumulator:
    """Per-env in-progress episodes. Leaves of ``store`` are
    (num_envs, T_max, ...); ``t`` is (num_envs,) int32."""

    store: Any
    t: chex.Array

    @staticmethod
    def create(num_envs: int, t_max: int, example: Any) -> "EpisodeAccumulator":
        store = jax.tree.map(
            lambda x: jnp.zeros(
                (num_envs, t_max) + jnp.shape(x), jnp.asarray(x).dtype
            ),
            example,
        )
        return EpisodeAccumulator(store=store, t=jnp.zeros((num_envs,), jnp.int32))

    def add_step(
        self,
        ring: EpisodeBuffer,
        record: Any,
        ended: chex.Array,
    ) -> Tuple["EpisodeAccumulator", EpisodeBuffer]:
        """Append one step for every env; commit episodes of envs whose
        ``ended`` flag is set.

        record: pytree with leading axis num_envs (one step per env).
        ended: (num_envs,) bool.
        """
        num_envs = self.t.shape[0]
        t_max = jax.tree.leaves(self.store)[0].shape[1]
        envs = jnp.arange(num_envs)
        tw = jnp.minimum(self.t, t_max - 1)
        store = jax.tree.map(
            lambda buf, x: buf.at[envs, tw].set(x), self.store, record
        )
        new_t = jnp.minimum(self.t + 1, t_max)

        # commit finished episodes into the ring
        cap = ring.capacity
        ended_i = ended.astype(jnp.int32)
        offsets = jnp.cumsum(ended_i) - ended_i
        dest = jnp.where(ended, jnp.mod(ring.cursor + offsets, cap), cap)
        data = jax.tree.map(lambda buf, s: buf.at[dest].set(s), ring.data, store)
        length = ring.length.at[dest].set(new_t)
        n_new = jnp.sum(ended_i)
        ring2 = ring.replace(
            data=data,
            length=length,
            cursor=jnp.mod(ring.cursor + n_new, cap),
            size=jnp.minimum(ring.size + n_new, cap),
        )
        acc2 = self.replace(store=store, t=jnp.where(ended, 0, new_t))
        return acc2, ring2
