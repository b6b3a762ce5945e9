"""Multi-chip scaling: env-batch data parallelism over a device mesh.

The reference's only parallelism is one OS process per Python env over
Pipes (/root/reference/cleanmarl/vdn_multienvs.py:229-297) — there is no
multi-device learner of any kind (SURVEY.md §2.1). The TPU-native
scaling story replaces it wholesale, following the standard
mesh/GSPMD recipe ("pick a mesh, annotate shardings, let XLA insert
collectives"):

- a 1-D ``Mesh(('data',))`` over all chips;
- the vectorized env batch, per-env episode accumulators, rollout
  streams and replay rings shard over ``data`` (leading axis);
- network/optimizer params stay replicated (``P()``);
- the SAME jitted train block used on one chip runs unchanged: XLA
  partitions the env/rollout math per shard and inserts the gradient
  all-reduce over ICI automatically, because the loss mean contracts
  the sharded batch axis against replicated params.

Why pure DP: CleanMARL's networks are tiny MLP/GRU stacks (hidden
32-128) — tensor/pipeline sharding has nothing to cut; the FLOPs and
memory scale with the env batch, which is exactly the axis ``data``
shards. Throughput scaling therefore comes from adding envs per chip,
the RL-correct analogue of data parallelism.
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(devices, (axis,))


def _leaf_sharding(leaf, mesh: Mesh, sharded_dims: Iterable[int], axis: str):
    """Shard a leaf over ``axis`` iff its leading dim is one of the known
    batch-like extents (num_envs, buffer capacity, ...) divisible by the
    mesh size; everything else (params, scalars) replicates."""
    n = mesh.shape[axis]
    if (
        hasattr(leaf, "ndim")
        and leaf.ndim >= 1
        and leaf.shape[0] in sharded_dims
        and leaf.shape[0] % n == 0
    ):
        return NamedSharding(mesh, P(axis))
    return NamedSharding(mesh, P())


def shard_runner(runner, mesh: Mesh, sharded_dims: Iterable[int], axis: str = "data"):
    """Place a runner state on the mesh: env-batch-like leading axes
    sharded, parameters replicated. Returns the device_put runner; the
    jitted train block then computes with these shardings (and keeps
    them on its outputs)."""
    dims = set(sharded_dims)
    return jax.tree.map(
        lambda l: jax.device_put(l, _leaf_sharding(l, mesh, dims, axis)), runner
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P())), tree
    )
