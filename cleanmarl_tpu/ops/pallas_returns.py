"""Pallas TPU kernel for the masked λ-return recursion.

The pure-XLA form (ops/returns.py) is a ``lax.scan`` over T — a chain
of T tiny elementwise kernels with an HBM round-trip per step. This
kernel runs the WHOLE backward recursion inside VMEM: the grid tiles
the flattened batch axis into 128-lane columns; each program loads its
(T, 128) column block once, iterates the recursion

    G_t = r_t + γ·(1−ended_t)·(λ·G_{t+1} + (1−λ)·V_{t+1})

with a ``fori_loop`` over rows held in registers/VMEM, and writes the
(T, 128) result back once. One kernel launch and 2·T·128·4 bytes of
HBM traffic per tile instead of T launches.

VMEM budget: 4 arrays × T×128×4B ≈ 0.5 MB at T=256 — far under the
16 MB/core budget (pallas_guide.md, Memory Hierarchy).

Non-TPU backends run the same kernel in interpreter mode (used by the
CPU test suite); numerical equality with the lax.scan form is
unit-tested.
"""
from __future__ import annotations

import functools

import chex
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(gamma: float, lam: float, r_ref, e_ref, vn_ref, boot_ref, out_ref):
    T = r_ref.shape[0]

    def body(i, g):
        t = T - 1 - i
        r = r_ref[pl.ds(t, 1), :]
        e = e_ref[pl.ds(t, 1), :]
        vn = vn_ref[pl.ds(t, 1), :]
        g = r + gamma * (1.0 - e) * (lam * g + (1.0 - lam) * vn)
        out_ref[pl.ds(t, 1), :] = g
        return g

    jax.lax.fori_loop(0, T, body, boot_ref[:, :])


@functools.partial(jax.jit, static_argnames=("gamma", "lam", "interpret"))
def _lambda_returns_2d(
    rewards: chex.Array,      # (T, B) f32
    ended: chex.Array,        # (T, B) f32
    next_values: chex.Array,  # (T, B) f32
    bootstrap: chex.Array,    # (1, B) f32
    gamma: float,
    lam: float,
    interpret: bool = False,
) -> chex.Array:
    T, B = rewards.shape
    pad = (-B) % LANES
    if pad:
        padder = lambda x: jnp.pad(x, ((0, 0), (0, pad)))  # noqa: E731
        rewards, ended, next_values, bootstrap = map(
            padder, (rewards, ended, next_values, bootstrap)
        )
    Bp = B + pad
    grid = (Bp // LANES,)
    col = lambda i: (0, i)  # noqa: E731
    out = pl.pallas_call(
        functools.partial(_kernel, gamma, lam),
        out_shape=jax.ShapeDtypeStruct((T, Bp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((T, LANES), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), col, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, LANES), col, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rewards, ended, next_values, bootstrap)
    return out[:, :B]


def lambda_returns_pallas(
    rewards: chex.Array,
    ended: chex.Array,
    values: chex.Array,
    bootstrap_value: chex.Array,
    gamma: float,
    lam: float,
) -> chex.Array:
    """Drop-in for ops.returns.lambda_returns (same semantics/shapes):
    rewards/ended/values (T, ...), bootstrap (...)."""
    shape = rewards.shape
    T = shape[0]
    flat = lambda x: x.reshape(T, -1).astype(jnp.float32)  # noqa: E731
    next_values = jnp.concatenate(
        [values[1:], bootstrap_value[None]], axis=0
    )
    interpret = jax.devices()[0].platform != "tpu"
    out = _lambda_returns_2d(
        flat(rewards),
        flat(ended.astype(jnp.float32)),
        flat(next_values),
        bootstrap_value.reshape(1, -1).astype(jnp.float32),
        gamma,
        lam,
        interpret=interpret,
    )
    return out.reshape(shape)
