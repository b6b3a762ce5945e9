"""North-star hyperparameter sweep: recurrent MAPPO on 3m.

One SUBPROCESS per config (VERDICT r1 weak-6: the round-1 in-process
sweep died on a backend re-init and produced zero data; here a backend
failure costs one config). Runs sequentially — only one JAX process may
claim the TPU at a time. Appends one line per config to
validation/sweep_mappo_3m.jsonl.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_mappo_3m.py
"""
import itertools
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "validation", "sweep_mappo_3m.jsonl")

# the MAPPO-for-SMAC recipe space (Yu et al. 2021: higher entropy,
# advantage normalization, more epochs) around the round-1 baseline.
# Sweep round 2: the epochs=8 + adv-norm recipe sustains ~0.87 with a
# stochastic eval policy; anneal entropy (sharpen the late policy) and
# try more capacity, across seeds.
# Sweep round 3: the hidden-128 recipe sustains 0.98/0.94/0.81 on
# seeds 1/2/3 — seed 3 commits to a weaker basin before the entropy
# anneals away. Probe robustness levers on the hard seed.
GRID = [
    dict(entropy_coef=0.01, epochs=8, normalize_advantage=1, lr=5e-4,
         anneal_entropy=1, hidden=128, seed=3),
    dict(entropy_coef=0.003, epochs=8, normalize_advantage=1, lr=5e-4,
         anneal_entropy=1, hidden=128, num_envs=512, seed=3),
    dict(entropy_coef=0.01, epochs=8, normalize_advantage=1, lr=5e-4,
         anneal_entropy=1, hidden=128, num_envs=512, seed=3),
    dict(entropy_coef=0.003, epochs=15, normalize_advantage=1, lr=5e-4,
         anneal_entropy=1, hidden=128, seed=3),
]


def tail_mean(curve_path: str, k: int = 5) -> float:
    """Mean eval battle_won over the last k evals — the 'sustained'
    score (a lucky single eval at the stop threshold is not)."""
    rows = [json.loads(l) for l in open(curve_path)]
    tail = [r["eval_battle_won"] for r in rows[-k:]]
    return sum(tail) / max(len(tail), 1)


def run_one(params: dict, budget: int) -> dict:
    params = dict(params)
    seed = params.pop("seed", 1)
    tag = "_".join(f"{k}{v}" for k, v in sorted(params.items()))
    curve = os.path.join(REPO, "validation", f"sweep3m_{tag}_s{seed}.jsonl")
    cmd = [
        sys.executable, os.path.join(REPO, "scripts", "mappo_3m_run.py"),
        "--out", curve, "--total_timesteps", str(budget),
        "--seed", str(seed), "--stop_at", "2.0",
    ]
    for k, v in params.items():
        cmd += [f"--{k}", str(v)]
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    # persistent compile cache: identical XLA programs compile once
    # across sweep subprocesses (fresh shapes can take ~10 min under
    # host-CPU contention, hence the generous timeout)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    t0 = time.time()
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=2400, env=env, cwd=REPO)
    except subprocess.TimeoutExpired:
        return {"params": params, "seed": seed, "error": "timeout"}
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            res = json.loads(line[len("RESULT "):])
            return {"params": params, "seed": seed, "best": res["best"],
                    "final": res["final"], "tail_mean": tail_mean(curve),
                    "wall_s": res["wall_s"], "curve": os.path.basename(curve)}
    return {"params": params, "seed": seed, "error": "crashed",
            "returncode": p.returncode, "tail": p.stdout[-500:] + p.stderr[-500:],
            "wall_s": round(time.time() - t0, 1)}


def main():
    budget = int(os.environ.get("SWEEP_BUDGET", 20_000_000))
    out = open(OUT, "a")
    for params in GRID:
        res = run_one(params, budget)
        out.write(json.dumps(res) + "\n")
        out.flush()
        print(json.dumps(res), flush=True)
    out.close()


if __name__ == "__main__":
    main()
