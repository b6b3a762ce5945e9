"""Reward post-processing.

``standardize`` reproduces the reference replay buffers' optional
per-sampled-batch reward normalization (mean/std over the sampled
transitions, /root/reference/cleanmarl/vdn.py:138-143; episode variant
qmix.py:190), with masked statistics for padded episode batches.
"""
from __future__ import annotations

from typing import Optional

import chex
import jax.numpy as jnp


def standardize(
    rewards: chex.Array, mask: Optional[chex.Array] = None, eps: float = 1e-6
) -> chex.Array:
    if mask is None:
        mu = rewards.mean()
        std = rewards.std()
    else:
        denom = jnp.maximum(mask.sum(), 1.0)
        mu = jnp.sum(rewards * mask) / denom
        var = jnp.sum(jnp.square(rewards - mu) * mask) / denom
        std = jnp.sqrt(var)
    return (rewards - mu) / (std + eps)
