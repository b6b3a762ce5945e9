"""Forensic experiment (VERDICT r1 item 1): is the 3m plateau an env-balance
artifact or an algorithm-tuning problem?

Plays scripted ally policies of increasing skill against the built-in bot on
the pure-JAX MicroCombat 3m map and reports win rates over a large env batch.
If good scripted play wins ~100%, the env is winnable and the MAPPO plateau is
a tuning issue; if even optimal focus-fire caps out near the observed ~0.7,
the env balance deviates from SMAC (where trained MAPPO reaches ~0.95+).

Policies:
  focus_first    — all allies attack enemy 0, then 1, ... (static focus);
                   move east toward the enemy line when no attack available.
  focus_weakest  — all allies attack the living enemy with the lowest
                   hp+shield (dynamic focus).
  focus_retreat  — focus weakest + the ally currently targeted by the bot
                   (nearest to the enemy centroid) retreats west when its own
                   hp is below half and it cannot fire this step.

Run: JAX_PLATFORMS=cpu python scripts/forensic_3m_scripted.py
"""
from __future__ import annotations

import json

import jax
import jax.numpy as jnp

from cleanmarl_tpu.envs.smaclite import MicroCombat, N_FIXED_ACTIONS
from cleanmarl_tpu.envs.base import VecEnv

NUM_ENVS = 1024
EPISODE_LIMIT = 150


def weakest_target(s, env):
    """Index of the living enemy with the least hp+shield."""
    eff = jnp.where(s.enemy_hp > 0, s.enemy_hp + s.enemy_shield, jnp.inf)
    return jnp.argmin(eff)


def policy_focus_first(s, avail, env):
    atk = avail[:, N_FIXED_ACTIONS:]
    first = jnp.argmax(jnp.where(s.enemy_hp > 0, 1.0, 0.0))
    has = atk[:, first] > 0
    return jnp.where(has, N_FIXED_ACTIONS + first, 4)  # 4 = move east


def policy_focus_weakest(s, avail, env):
    atk = avail[:, N_FIXED_ACTIONS:]
    tgt = weakest_target(s, env)
    has = atk[:, tgt] > 0
    return jnp.where(has, N_FIXED_ACTIONS + tgt, 4)


def policy_focus_avail_weakest(s, avail, env):
    """Attack the weakest enemy among each ally's own AVAILABLE targets;
    approach (move east) when none is in order range."""
    atk = avail[:, N_FIXED_ACTIONS:] > 0                       # (A,E)
    eff = s.enemy_hp + s.enemy_shield
    score = jnp.where(atk, eff[None, :], jnp.inf)
    tgt = jnp.argmin(score, axis=-1)                            # (A,)
    has = jnp.any(atk, axis=-1)
    return jnp.where(has, N_FIXED_ACTIONS + tgt, 4)


def policy_focus_retreat(s, avail, env):
    """Focus-fire + tanking rotation: an ally locked by 2+ enemies pulls
    back while its own weapon is on cooldown, breaking the bot's pursuit
    leash and rotating fire across the team (the SMAC micro)."""
    base = policy_focus_avail_weakest(s, avail, env)
    alive = s.ally_hp > 0
    tgt = jnp.where(s.enemy_target >= 0, s.enemy_target, env.n_agents)
    locks = jnp.zeros(env.n_agents + 1).at[tgt].add(
        (s.enemy_hp > 0).astype(jnp.float32)
    )[: env.n_agents]
    hurt = s.ally_hp < env.a_max_hp
    on_cd = s.ally_cd > 0
    retreat = (locks >= 2) & hurt & on_cd & alive & (avail[:, 5] > 0)
    return jnp.where(retreat, 5, base)


def run(policy, env):
    vec = VecEnv(env, NUM_ENVS)

    def step_fn(carry, _):
        env_state, ts, key, wins, losses = carry
        key, k = jax.random.split(key)
        actions = jax.vmap(lambda es, av: policy(es, av, env))(
            env_state, ts.avail
        ).astype(jnp.int32)
        env_state, ts2, final = vec.step(env_state, actions, k)
        ended = jnp.logical_or(ts2.done, ts2.truncated)
        won = ts2.info["battle_won"]
        wins = wins + jnp.sum(jnp.where(ended, won, 0.0))
        losses = losses + jnp.sum(jnp.where(ended, 1.0 - won, 0.0))
        return (env_state, ts2, key, wins, losses), None

    @jax.jit
    def episode(key):
        env_state, ts = vec.reset(key)
        carry = (env_state, ts, key, jnp.zeros(()), jnp.zeros(()))
        carry, _ = jax.lax.scan(step_fn, carry, None, length=EPISODE_LIMIT * 2)
        _, _, _, wins, losses = carry
        return wins, losses

    wins, losses = episode(jax.random.PRNGKey(0))
    total = float(wins + losses)
    return float(wins) / total, int(total)


def main():
    env = MicroCombat(3, 3, time_limit=EPISODE_LIMIT)
    results = {}
    for name, pol in [
        ("focus_first", policy_focus_first),
        ("focus_weakest", policy_focus_weakest),
        ("focus_avail_weakest", policy_focus_avail_weakest),
        ("focus_retreat", policy_focus_retreat),
    ]:
        wr, n = run(pol, env)
        results[name] = {"win_rate": round(wr, 4), "episodes": n}
        print(f"{name}: win_rate={wr:.4f} over {n} episodes")
    with open("validation/forensic_3m_scripted.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
