"""Optimizer construction by name with optional global-norm clipping —
mirrors the reference's ``getattr(optax, args.optimizer)`` +
``optax.chain(clip_by_global_norm, ...)`` pattern
(/root/reference/cleanmarl/vdn_jax.py:302-307; torch twin vdn.py:221-222,
325-328; clip disabled when clip_gradients <= 0).
"""
from __future__ import annotations

import optax


def make_optimizer(
    name: str,
    learning_rate: float,
    clip_gradients: float = 0.0,
    anneal_steps: int = 0,
):
    """``anneal_steps > 0`` decays the LR linearly to 0 over that many
    optimizer updates (an option the reference lacks; off by default)."""
    name = name.lower()
    if not hasattr(optax, name):
        raise ValueError(f"optax has no optimizer named {name!r}")
    lr = learning_rate
    if anneal_steps and anneal_steps > 0:
        lr = optax.linear_schedule(learning_rate, 0.0, anneal_steps)
    opt = getattr(optax, name)(lr)
    if clip_gradients and clip_gradients > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip_gradients), opt)
    return opt
