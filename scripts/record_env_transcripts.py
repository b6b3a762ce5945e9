"""Record fixed action-script transcripts of the pure-JAX envs.

For each configured env (SMAClite 3m/2s3z/MMM, LBF Foraging-8x8-2p-3f)
this walks a deterministic action script — a seeded uniform choice over
the live avail mask — through K episodes of the JAX env and records,
per step: the pre-step avail mask the action was drawn from, the action,
and the resulting obs/state/reward/done/truncated.

The committed .npz transcripts (validation/transcripts/) are one half of
the upstream-fidelity harness (VERDICT r3 next-6): the day a real
smaclite/lbforaging wheel is installable, ``scripts/diff_vs_upstream.py``
replays the same action script against the upstream env
(/root/reference/cleanmarl/env/smaclite_wrapper.py:14 / lbf.py:13 — the
envs the reference actually trains on) and tabulates the per-field
deltas in one command, turning ENVS_FIDELITY.md's published-behavior
diffs into executed ones.

Usage: PYTHONPATH=. python scripts/record_env_transcripts.py
"""
import os

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_DIR = os.path.join(REPO, "validation", "transcripts")

SPECS = [
    # (name, env_type, env_name, episodes, env_kwargs)
    ("smaclite_3m", "smaclite", "3m", 3, {}),
    ("smaclite_2s3z", "smaclite", "2s3z", 3, {}),
    ("smaclite_MMM", "smaclite", "MMM", 2, {}),
    ("lbf_8x8_2p_3f", "lbf", "Foraging-8x8-2p-3f-v3", 3, {}),
    # compact pursuit config: dynamics pin for the round-4 env (its
    # upstream diff is the direct cross-validation in
    # tests/test_envs_pursuit.py; this transcript guards regressions)
    ("pursuit_small", "pursuit", "pursuit_v4", 2,
     {"n_pursuers": 4, "n_evaders": 6, "time_limit": 60}),
]


def record(env, episodes: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    step_jit = jax.jit(env.step)
    reset_jit = jax.jit(env.reset)
    rows = {k: [] for k in (
        "ep", "t", "avail_pre", "action", "obs", "state", "avail",
        "reward", "done", "truncated",
    )}
    for ep in range(episodes):
        state, ts = reset_jit(jax.random.PRNGKey(seed * 1000 + ep))
        t = 0
        ended = False
        while not ended:
            avail_pre = np.asarray(ts.avail).astype(bool)
            # deterministic script: seeded uniform choice over avail
            action = np.array([
                rng.choice(np.nonzero(avail_pre[i])[0])
                for i in range(env.n_agents)
            ], np.int32)
            state, ts = step_jit(
                state, jax.numpy.asarray(action),
                jax.random.PRNGKey(seed * 100000 + ep * 1000 + t),
            )
            rows["ep"].append(ep)
            rows["t"].append(t)
            rows["avail_pre"].append(avail_pre)
            rows["action"].append(action)
            rows["obs"].append(np.asarray(ts.obs, np.float32))
            rows["state"].append(np.asarray(ts.state, np.float32))
            rows["avail"].append(np.asarray(ts.avail).astype(bool))
            rows["reward"].append(float(ts.reward))
            rows["done"].append(bool(ts.done))
            rows["truncated"].append(bool(ts.truncated))
            ended = bool(ts.done) or bool(ts.truncated)
            t += 1
    return {k: np.asarray(v) for k, v in rows.items()}


def main():
    from cleanmarl_tpu.envs import registry

    import json

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, env_type, env_name, episodes, env_kwargs in SPECS:
        env = registry.make(env_type, env_name, agent_ids=False,
                            **env_kwargs)
        data = record(env, episodes)
        meta = dict(
            env_type=env_type, env_name=env_name, episodes=episodes,
            n_agents=env.n_agents, obs_dim=env.obs_dim,
            state_dim=env.state_dim, n_actions=env.n_actions,
            episode_limit=env.episode_limit, seed=0,
            env_kwargs=json.dumps(env_kwargs),
        )
        path = os.path.join(OUT_DIR, f"{name}.npz")
        np.savez_compressed(path, **data,
                            **{f"meta_{k}": v for k, v in meta.items()})
        print(f"{name}: {len(data['t'])} steps over {episodes} episodes "
              f"-> {path}")


if __name__ == "__main__":
    main()
