"""λ-returns / advantages over auto-reset rollout streams.

The reference computes TD(λ) targets with a per-episode reversed Python
loop over padded episodes (/root/reference/cleanmarl/ippo.py:394-411;
jitted per-episode scan with *static* episode lengths — a recompile per
length tuple — in mappo_jax_multienvs.py:336-417). Here the recursion is
a single ``lax.scan`` over the time axis of the whole (T, B, ...) block
with episode boundaries handled by the ``ended`` flags, so one compiled
program covers every episode-length pattern:

    G_t = r_t + γ(1−ended_t)·(λ·G_{t+1} + (1−λ)·V_{t+1})

with G_T = V_T (bootstrap at a mid-episode rollout cut). For steps where
the episode truly ended, the reference's ``next_value = 0`` convention
(ippo.py:399-401 — time-limit truncation is NOT bootstrapped) is
reproduced by folding truncation into ``ended``.
"""
from __future__ import annotations

import chex
import jax
import jax.numpy as jnp


def lambda_returns(
    rewards: chex.Array,     # (T, ...) team reward broadcast over trailing dims
    ended: chex.Array,       # (T, ...) bool — episode boundary after step t
    values: chex.Array,      # (T, ...) V(o_t)
    bootstrap_value: chex.Array,  # (...) V(o_T) at the rollout cut
    gamma: float,
    lam: float,
    use_pallas: bool | None = None,
) -> chex.Array:
    """Returns G (T, ...). Time axis is leading.

    On TPU the recursion runs as a single Pallas kernel per 128-lane
    batch tile (ops/pallas_returns.py) instead of T chained scan steps;
    pass ``use_pallas=False`` to force the lax.scan form."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from cleanmarl_tpu.ops.pallas_returns import lambda_returns_pallas

        return lambda_returns_pallas(
            rewards, ended, values, bootstrap_value, gamma, lam
        )
    ended_f = ended.astype(values.dtype)
    next_values = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)

    def body(g_next, inp):
        r, e, v_next = inp
        g = r + gamma * (1.0 - e) * (lam * g_next + (1.0 - lam) * v_next)
        return g, g

    _, gs = jax.lax.scan(
        body,
        bootstrap_value,
        (rewards, ended_f, next_values),
        reverse=True,
    )
    return gs


def lambda_advantages(rewards, ended, values, bootstrap_value, gamma, lam):
    """(G, A) with A_t = G_t − V_t (ippo.py:409-411)."""
    g = lambda_returns(rewards, ended, values, bootstrap_value, gamma, lam)
    return g, g - values


def nstep_returns(
    rewards: chex.Array,          # (T, ...)
    ended: chex.Array,            # (T, ...) bool
    values: chex.Array,           # (T, ...) bootstrap value at step t
    bootstrap_value: chex.Array,  # (...) value at the rollout cut
    gamma: float,
    n: int,
) -> chex.Array:
    """n-step targets over an auto-reset rollout stream.

    Mirrors /root/reference/cleanmarl/coma.py:497-528 (use_tdlamda=False,
    arbitrary ``nsteps``): G_t = Σ_{i<n} γ^i r_{t+i} + γ^n V_{t+n}, with
    the window truncating at an episode boundary (steps inside the last
    n of an episode get the plain discounted sum of the remaining
    rewards, no bootstrap — the reference's else-branch). Episodes cut
    by the rollout edge bootstrap with ``bootstrap_value`` at whatever
    depth the window reaches the edge, matching ``lambda_returns``'s
    treatment of the cut.

    Built as n unrolled sweeps of G^{(k)}_t = r_t + γ(1−e_t)·G^{(k−1)}_{t+1}
    starting from G^{(0)} = values — each sweep is one fused elementwise
    op over the whole (T, ...) block, no sequential scan.
    """
    if n < 1:
        raise ValueError(f"nsteps must be >= 1, got {n}")
    ended_f = ended.astype(values.dtype)
    g = values
    for _ in range(n):
        g_next = jnp.concatenate([g[1:], bootstrap_value[None]], axis=0)
        g = rewards + gamma * (1.0 - ended_f) * g_next
    return g
