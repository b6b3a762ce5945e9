"""Multi-chip / multi-host scaling: env-batch data parallelism over a
device mesh, with explicit per-field PartitionSpecs.

The reference's only parallelism is one OS process per Python env over
Pipes (/root/reference/cleanmarl/vdn_multienvs.py:229-297) — there is no
multi-device learner of any kind (SURVEY.md §2.1). The TPU-native
scaling story replaces it wholesale, following the standard mesh/GSPMD
recipe ("pick a mesh, annotate shardings, let XLA insert collectives"):

- a 1-D ``Mesh(('data',))`` over all chips of all hosts;
- the vectorized env batch, per-env episode accumulators, rollout
  streams and replay storage shard over ``data``;
- network/optimizer params stay replicated (``P()``);
- the SAME jitted train block used on one chip runs unchanged: XLA
  partitions the env/rollout math per shard and inserts the gradient
  all-reduce over ICI/DCN automatically, because the loss mean
  contracts the sharded batch axis against replicated params.

Which axes are batch-like is declared EXPLICITLY per runner field in
``DATA_FIELD_DIMS`` (one table per algorithm family) — not inferred
from dimension sizes, so a parameter whose leading dim happens to equal
``num_envs`` can never be mis-sharded (VERDICT r1 weak-3). Within a
declared field, scalar leaves (episode-stat aggregates, ring cursors)
and leaves whose batch extent does not divide the mesh replicate.

Why pure DP: CleanMARL's networks are tiny MLP/GRU stacks (hidden
32-128) — tensor/pipeline sharding has nothing to cut; the FLOPs and
memory scale with the env batch, which is exactly the axis ``data``
shards. Throughput scaling therefore comes from adding envs per chip,
the RL-correct analogue of data parallelism. Multi-host execution uses
the same code path: ``jax.distributed.initialize`` (distributed/
multihost.py) makes every host's chips part of one global mesh, and
``global_runner_init`` materializes the runner directly into its
global shardings.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ---------------------------------------------------------------------------
# Explicit env-batch axis tables: runner field name → axis index carrying
# the env batch. Everything NOT listed here (params, targets, optimizer
# states, RNG keys, scalar counters) replicates.
_COMMON = {"env_state": 0, "obs": 0, "state": 0, "avail": 0, "stats": 0}
DATA_FIELD_DIMS: Dict[str, Dict[str, int]] = {
    # on-policy actor-critics: GRU carry is per-env
    "PPO": {**_COMMON, "actor_h": 0},
    "COMA": {**_COMMON, "actor_h": 0},
    # flat transition ring (capacity, ...) with env rows interleaved:
    # shard the capacity axis so replay HBM scales with the mesh
    "VDN": {**_COMMON, "buffer": 0},
    # episode-based off-policy: per-env accumulators + episode ring
    # (capacity, T, ...) sharded over capacity so replay HBM scales
    "QMIX": {**_COMMON, "acc": 0, "ring": 0},
    "RECURRENT_Q": {**_COMMON, "h": 0, "acc": 0, "ring": 0},
    "MADDPG": {**_COMMON, "actor_h": 0, "acc": 0, "ring": 0},
    "FACMAC": {**_COMMON, "acc": 0, "ring": 0},
}


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(devices, (axis,))


def _leaf_spec(leaf, dim: int, n: int, axis: str) -> P:
    shape = getattr(leaf, "shape", ())
    if len(shape) > dim and shape[dim] % n == 0 and shape[dim] > 0:
        return P(*([None] * dim + [axis]))
    return P()


def runner_pspecs(runner, field_dims: Dict[str, int], mesh: Mesh,
                  axis: str = "data"):
    """PartitionSpec pytree for a runner dataclass (or its eval_shape),
    driven by the explicit per-field table. Works on concrete runners
    and on ``jax.eval_shape`` results alike."""
    n = mesh.shape[axis]
    out = {}
    for f in dataclasses.fields(runner):
        sub = getattr(runner, f.name)
        if f.name in field_dims:
            d = field_dims[f.name]
            out[f.name] = jax.tree.map(
                lambda l, d=d: _leaf_spec(l, d, n, axis), sub
            )
        else:
            out[f.name] = jax.tree.map(lambda l: P(), sub)
    return runner.replace(**out)


def runner_shardings(runner, field_dims: Dict[str, int], mesh: Mesh,
                     axis: str = "data"):
    """NamedSharding pytree (for ``jit(..., out_shardings=...)``)."""
    specs = runner_pspecs(runner, field_dims, mesh, axis)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_runner(runner, mesh: Mesh, field_dims: Dict[str, int],
                 axis: str = "data"):
    """Place a runner on the mesh per the explicit field table: env-batch
    axes sharded, everything else replicated. The jitted train block then
    computes with (and preserves) these shardings."""
    sh = runner_shardings(runner, field_dims, mesh, axis)
    return jax.tree.map(jax.device_put, runner, sh)


def global_runner_init(init_fn, key, mesh: Mesh, field_dims: Dict[str, int],
                       axis: str = "data"):
    """Run ``init_fn(key)`` as one jitted program whose outputs land
    directly in their global shardings — the multi-host-safe way to
    materialize the runner (every process participates in one global
    computation; no host ever holds the full env batch)."""
    shape_tree = jax.eval_shape(init_fn, key)
    sh = runner_shardings(shape_tree, field_dims, mesh, axis)
    return jax.jit(init_fn, out_shardings=sh)(key)


def replicate(tree, mesh: Mesh):
    return jax.tree.map(
        lambda l: jax.device_put(l, NamedSharding(mesh, P())), tree
    )
