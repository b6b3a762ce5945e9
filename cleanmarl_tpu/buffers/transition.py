"""HBM transition ring buffer (VDN-style flat replay).

TPU-native replacement for the reference's numpy ring buffer
(/root/reference/cleanmarl/vdn.py:98-151; env-axis variant
vdn_multienvs.py:101-177): storage is a preallocated pytree of device
arrays that lives in HBM for the whole run; writes are vectorized
scatter updates at ``(cursor + arange(B)) % capacity``; sampling is a
uniform gather. All methods are pure (state in, state out) so the buffer
can sit inside a jitted, donated training loop — no host round-trips.
"""
from __future__ import annotations

from typing import Any

import chex
import jax
import jax.numpy as jnp


@chex.dataclass(frozen=True)
class TransitionBuffer:
    """``data`` is a pytree whose leaves have shape (capacity, ...)."""

    data: Any
    cursor: chex.Array  # () int32 — next write position
    size: chex.Array    # () int32 — number of valid rows

    @property
    def capacity(self) -> int:
        return jax.tree.leaves(self.data)[0].shape[0]

    # ------------------------------------------------------------------
    @staticmethod
    def create(capacity: int, example: Any) -> "TransitionBuffer":
        """``example`` is one unbatched transition pytree (shapes without
        the capacity axis)."""
        data = jax.tree.map(
            lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
            example,
        )
        return TransitionBuffer(
            data=data,
            cursor=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    def add_batch(self, batch: Any) -> "TransitionBuffer":
        """Insert a batch (leading axis B) at the ring cursor."""
        b = jax.tree.leaves(batch)[0].shape[0]
        cap = self.capacity
        idx = jnp.mod(self.cursor + jnp.arange(b), cap)
        data = jax.tree.map(lambda buf, x: buf.at[idx].set(x), self.data, batch)
        return self.replace(
            data=data,
            cursor=jnp.mod(self.cursor + b, cap),
            size=jnp.minimum(self.size + b, cap),
        )

    def sample(self, key: chex.PRNGKey, batch_size: int) -> Any:
        """Uniform sample with replacement over valid rows (matches the
        reference's np.random.randint sampling, vdn.py:131-134)."""
        idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(self.size, 1))
        return jax.tree.map(lambda buf: buf[idx], self.data)
