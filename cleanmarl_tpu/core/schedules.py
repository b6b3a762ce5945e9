"""Exploration schedules (jit-safe).

``linear_schedule`` mirrors /root/reference/cleanmarl/vdn.py:154-156:
linear decay from start_e to end_e over ``duration`` steps, clipped.
"""
from __future__ import annotations

import jax.numpy as jnp


def linear_schedule(start_e: float, end_e: float, duration: float, t):
    slope = (end_e - start_e) / duration
    return jnp.maximum(slope * t + start_e, end_e)
