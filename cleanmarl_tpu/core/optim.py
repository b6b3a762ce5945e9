"""Optimizer construction by name with optional global-norm clipping —
mirrors the reference's ``getattr(optax, args.optimizer)`` +
``optax.chain(clip_by_global_norm, ...)`` pattern
(/root/reference/cleanmarl/vdn_jax.py:302-307; torch twin vdn.py:221-222,
325-328; clip disabled when clip_gradients <= 0).
"""
from __future__ import annotations

import optax


def make_optimizer(name: str, learning_rate: float, clip_gradients: float = 0.0):
    name = name.lower()
    if not hasattr(optax, name):
        raise ValueError(f"optax has no optimizer named {name!r}")
    opt = getattr(optax, name)(learning_rate)
    if clip_gradients and clip_gradients > 0:
        opt = optax.chain(optax.clip_by_global_norm(clip_gradients), opt)
    return opt
