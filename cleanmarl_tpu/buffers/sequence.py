"""HBM sequence replay: fixed-length chunk ring for recurrent Q-learning.

TPU-native rebuild of the reference's sequence ReplayBuffer
(/root/reference/cleanmarl/vdn_lstm.py:100-183): episodes are cut into
contiguous ``seq_length``-step chunks as they stream in; the final
partial chunk of an episode is back-filled from that env's previously
stored chunk so every stored row is dense (the ``is_last`` overlap
patch, vdn_lstm.py:137-156). Sampling is uniform over chunks and
returns fixed (B, L, ...) shapes — no masks, no dynamic shapes.

Differences from the reference, both vectorization-required:
- one ring serves ``num_envs`` streams; the back-fill source is tracked
  PER ENV (``prev``) so each env patches from its own last chunk, which
  is exactly the reference's single-env ``last_pos`` semantics;
- commits happen inside jit via a scatter with a scratch row (the same
  pattern as buffers/episode.py).
"""
from __future__ import annotations

from typing import Any, Tuple

import chex
import jax
import jax.numpy as jnp


@chex.dataclass(frozen=True)
class SequenceBuffer:
    """Leaves of ``data`` have shape (capacity + 1, L, ...); row
    ``capacity`` is a scratch slot absorbing non-committed writes."""

    data: Any
    cursor: chex.Array  # () int32
    size: chex.Array    # () int32

    @property
    def capacity(self) -> int:
        return jax.tree.leaves(self.data)[0].shape[0] - 1

    @property
    def seq_length(self) -> int:
        return jax.tree.leaves(self.data)[0].shape[1]

    @staticmethod
    def create(capacity: int, seq_length: int, example: Any) -> "SequenceBuffer":
        data = jax.tree.map(
            lambda x: jnp.zeros(
                (capacity + 1, seq_length) + jnp.shape(x), jnp.asarray(x).dtype
            ),
            example,
        )
        return SequenceBuffer(
            data=data,
            cursor=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    def sample(self, key: chex.PRNGKey, batch_size: int):
        """→ records (B, L, ...), uniform over stored chunks
        (vdn_lstm.py:168-170). Rows are dense; no mask."""
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return jax.tree.map(lambda buf: buf[idx], self.data)


@chex.dataclass(frozen=True)
class SequenceAccumulator:
    """Per-env in-progress chunks. Leaves of ``store`` and ``prev`` are
    (num_envs, L, ...); ``t`` is (num_envs,) int32. ``prev`` holds each
    env's most recently committed chunk (zeros before the first commit,
    matching the reference's zero-initialized storage at
    vdn_lstm.py:119-130)."""

    store: Any
    prev: Any
    t: chex.Array

    @staticmethod
    def create(num_envs: int, seq_length: int, example: Any) -> "SequenceAccumulator":
        zeros = jax.tree.map(
            lambda x: jnp.zeros(
                (num_envs, seq_length) + jnp.shape(x), jnp.asarray(x).dtype
            ),
            example,
        )
        return SequenceAccumulator(
            store=zeros,
            prev=jax.tree.map(jnp.copy, zeros),
            t=jnp.zeros((num_envs,), jnp.int32),
        )

    def add_step(
        self,
        ring: SequenceBuffer,
        record: Any,
        ended: chex.Array,
    ) -> Tuple["SequenceAccumulator", SequenceBuffer]:
        """Append one step per env; commit chunks that became full and
        (back-fill-patched) final chunks of ended episodes.

        record: pytree with leading axis num_envs. ended: (num_envs,) bool.
        """
        num_envs = self.t.shape[0]
        L = jax.tree.leaves(self.store)[0].shape[1]
        envs = jnp.arange(num_envs)
        idx = jnp.arange(L)

        store = jax.tree.map(
            lambda buf, x: buf.at[envs, self.t].set(x), self.store, record
        )
        t_new = self.t + 1                     # ≥ 1: this step was written
        full = t_new == L
        commit = jnp.logical_or(full, ended)
        patch = jnp.logical_and(ended, ~full)  # back-fill needed

        # the is_last overlap patch (vdn_lstm.py:137-156): first
        # (L − t_new) entries come from the env's previous chunk's tail,
        # the rest are this partial chunk shifted right
        def patch_env(prev_e, cur_e, t_e):
            toadd = L - t_e
            prev_idx = jnp.clip(t_e + idx, 0, L - 1)
            cur_idx = jnp.clip(idx - toadd, 0, L - 1)
            sel = (idx < toadd).reshape((L,) + (1,) * (prev_e.ndim - 1))
            return jnp.where(sel, prev_e[prev_idx], cur_e[cur_idx])

        patched = jax.tree.map(
            lambda p, c: jax.vmap(patch_env)(p, c, t_new), self.prev, store
        )
        chunk = jax.tree.map(
            lambda pt, st: jnp.where(
                patch.reshape((num_envs,) + (1,) * (st.ndim - 1)), pt, st
            ),
            patched,
            store,
        )

        cap = ring.capacity
        commit_i = commit.astype(jnp.int32)
        offsets = jnp.cumsum(commit_i) - commit_i
        dest = jnp.where(commit, jnp.mod(ring.cursor + offsets, cap), cap)
        data = jax.tree.map(lambda buf, c: buf.at[dest].set(c), ring.data, chunk)
        n_new = jnp.sum(commit_i)
        ring2 = ring.replace(
            data=data,
            cursor=jnp.mod(ring.cursor + n_new, cap),
            size=jnp.minimum(ring.size + n_new, cap),
        )
        prev2 = jax.tree.map(
            lambda pv, c: jnp.where(
                commit.reshape((num_envs,) + (1,) * (c.ndim - 1)), c, pv
            ),
            self.prev,
            chunk,
        )
        acc2 = self.replace(
            store=store,
            prev=prev2,
            t=jnp.where(jnp.logical_or(commit, ended), 0, t_new),
        )
        return acc2, ring2
