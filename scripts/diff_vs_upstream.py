"""Replay the committed JAX-env transcripts against the REAL upstream
packages (smaclite, lbforaging) and tabulate per-field deltas.

This is the executable half of the upstream-fidelity harness (VERDICT
r3 next-6). The wheels the reference wraps
(/root/reference/cleanmarl/env/smaclite_wrapper.py:14, env/lbf.py:13)
are not installed in this image, so ENVS_FIDELITY.md's deltas are
diffed against *published* behavior; the day a wheel is available,
this script turns the diff into one command:

    PYTHONPATH=. python scripts/diff_vs_upstream.py

For every transcript in validation/transcripts/ it constructs the
matching upstream env, replays the recorded action script, and reports:
- interface agreement (n_agents / obs_dim / state_dim / n_actions);
- avail-mask agreement rate per step;
- action feasibility (recorded action legal upstream?); infeasible
  actions fall back to the upstream no-op and are counted;
- obs/state mean-abs deltas, per-episode reward-sum deltas, and
  termination-step deltas.

Known deliberate dynamics deltas (ENVS_FIDELITY.md S1-S11, L3) mean the
trajectories are NOT expected to match bit-for-bit — the report is the
quantified gap, not an assertion. Exit code: 0 always when the wheels
are absent (clean skip); 0 with a report when present; 1 only on an
interface-contract mismatch (shapes/sizes), which WOULD be a bug.
"""
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRANSCRIPTS = os.path.join(REPO, "validation", "transcripts")


def load(path):
    z = np.load(path)
    meta = {k[len("meta_"):]: z[k].item() if z[k].ndim == 0 else z[k]
            for k in z.files if k.startswith("meta_")}
    data = {k: z[k] for k in z.files if not k.startswith("meta_")}
    return meta, data


def make_upstream(meta):
    """→ (env, reset_fn, step_fn, get_avail, get_state) or None if the
    wheel is absent. API per the reference wrappers."""
    env_type = str(meta["env_type"])
    if env_type == "smaclite":
        try:
            import smaclite  # noqa: F401
            import gymnasium as gym
            from gymnasium.wrappers import TimeLimit
        except ImportError:
            return None
        env = TimeLimit(
            gym.make(f"smaclite/{meta['env_name']}-v0", seed=0),
            max_episode_steps=int(meta["episode_limit"]),
        )
        u = env.unwrapped
        return dict(
            env=env,
            reset=lambda seed: env.reset(seed=seed)[0],
            step=lambda a: env.step([int(x) for x in a]),
            avail=lambda: np.array(u.get_avail_actions(), bool),
            state=lambda: np.asarray(u.get_state(), np.float32),
            sizes=lambda: (u.n_agents, u.obs_size, u.state_size),
        )
    if env_type == "lbf":
        try:
            import lbforaging  # noqa: F401
            import gymnasium as gym
            from gymnasium.wrappers import TimeLimit
        except ImportError:
            return None
        env = TimeLimit(
            gym.make(str(meta["env_name"])),
            max_episode_steps=int(meta["episode_limit"]),
        )
        u = env.unwrapped
        return dict(
            env=env,
            reset=lambda seed: env.reset(seed=seed)[0],
            step=lambda a: env.step([int(x) for x in a]),
            avail=lambda: np.array(
                [u.get_avail_agent_actions(i) for i in range(u.n_agents)],
                bool,
            ),
            state=lambda: np.concatenate(
                [np.asarray(o, np.float32).reshape(-1) for o in u._last_obs]
            ) if hasattr(u, "_last_obs") else None,
            sizes=lambda: (u.n_agents, None, None),
        )
    return None


def diff_one(path):
    meta, data = load(path)
    up = make_upstream(meta)
    name = os.path.basename(path)
    if up is None:
        return {"transcript": name, "status": "skipped (wheel absent)"}

    n_agents, obs_dim, state_dim = up["sizes"]()
    contract_ok = int(n_agents) == int(meta["n_agents"])
    report = {
        "transcript": name,
        "status": "diffed",
        "interface": {
            "n_agents": [int(meta["n_agents"]), int(n_agents)],
            "obs_dim": [int(meta["obs_dim"]),
                        None if obs_dim is None else int(obs_dim)],
            "state_dim": [int(meta["state_dim"]),
                          None if state_dim is None else int(state_dim)],
        },
    }
    if not contract_ok:
        report["error"] = "n_agents mismatch — interface contract broken"
        return report

    avail_agree, infeasible, obs_mae, state_mae = [], 0, [], []
    rew_ours, rew_up, term_delta = {}, {}, []
    ep_prev = -1
    dead_ep = None   # upstream ended this episode early: skip its rows
    for i in range(len(data["t"])):
        ep, t = int(data["ep"][i]), int(data["t"][i])
        if ep != ep_prev:
            up["reset"](seed=ep)
            ep_prev = ep
            dead_ep = None
            rew_up[ep] = 0.0
            rew_ours[ep] = 0.0
        if ep == dead_ep:
            continue
        ua = up["avail"]()
        ra = data["avail_pre"][i]
        if ua.shape == ra.shape:
            avail_agree.append(float((ua == ra).mean()))
        act = data["action"][i].copy()
        for j in range(len(act)):
            if not ua[j, act[j] if act[j] < ua.shape[1] else 0]:
                infeasible += 1
                act[j] = int(np.nonzero(ua[j])[0][0])
        obs, reward, done, trunc, _ = up["step"](act)
        obs = np.asarray(obs, np.float32)
        if obs.shape == data["obs"][i].shape:
            obs_mae.append(float(np.abs(obs - data["obs"][i]).mean()))
        st = up["state"]()
        if st is not None and st.shape == data["state"][i].shape:
            state_mae.append(float(np.abs(st - data["state"][i]).mean()))
        rew_up[ep] += float(np.sum(reward))
        rew_ours[ep] += float(data["reward"][i])
        ours_ended = bool(data["done"][i]) or bool(data["truncated"][i])
        up_ended = bool(done) or bool(trunc)
        if ours_ended != up_ended:
            term_delta.append({"ep": ep, "t": t, "ours": ours_ended,
                               "upstream": up_ended})
        if up_ended and not ours_ended:
            # upstream episode ended early — ignore the rest of this
            # recorded episode (cannot step a terminated gymnasium env)
            dead_ep = ep
    report.update({
        "avail_agreement_mean": round(float(np.mean(avail_agree)), 4)
        if avail_agree else None,
        "infeasible_actions": infeasible,
        "obs_mae_mean": round(float(np.mean(obs_mae)), 5)
        if obs_mae else "shape mismatch",
        "state_mae_mean": round(float(np.mean(state_mae)), 5)
        if state_mae else "shape mismatch",
        "reward_sums": {str(e): [round(rew_ours[e], 3), round(rew_up[e], 3)]
                        for e in rew_ours},
        "termination_deltas": term_delta[:10],
    })
    return report


def main():
    paths = sorted(glob.glob(os.path.join(TRANSCRIPTS, "*.npz")))
    if not paths:
        print(json.dumps({"error": "no transcripts; run "
                          "scripts/record_env_transcripts.py first"}))
        sys.exit(1)
    bad_contract = False
    for p in paths:
        rep = diff_one(p)
        print(json.dumps(rep))
        if "error" in rep:
            bad_contract = True
    sys.exit(1 if bad_contract else 0)


if __name__ == "__main__":
    main()
