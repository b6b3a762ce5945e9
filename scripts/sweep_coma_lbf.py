"""COMA-LBF stabilizer ablation (VERDICT r2 weak-6 / next-10).

The stable round-2 recipe (lr 1e-4 annealed) plateaus at ~0.35 food
collected vs IPPO's 0.83 on the same map; the reference labels coma_lbf
experimental (coma_lbf.py:1-5). This grid probes the stabilizer axes the
verdict called out: target-critic polyak rate, critic width, and n-step
vs TD(λ) targets. One subprocess per config (a backend failure costs one
run); each records tail-5 mean eval food to
validation/sweep_coma_lbf.jsonl.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_coma_lbf.py
"""
import itertools
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = dict(
    env_type="lbf", env_name="Foraging-8x8-2p-3f-v3",
    num_envs=64, total_timesteps=2_000_000,
    per_agent_rewards=True, bootstrap_truncation=True,
    entropy_coef=0.003, exploration_fraction=3000.0,
    learning_rate_actor=1e-4, learning_rate_critic=1e-4,
    anneal_lr=True, actor_hidden_dim=64, critic_hidden_dim=64,
    log_interval=4, num_eval_ep=64, verbose=False,
)

GRID = [
    {},                                              # round-2 stable recipe
    {"polyak": 0.01},
    {"polyak": 0.05},
    {"critic_hidden_dim": 128},
    {"critic_hidden_dim": 128, "polyak": 0.05},
    {"use_tdlambda": False, "nsteps": 5},
    {"use_tdlambda": False, "nsteps": 10},
    {"td_lambda": 0.95},
    {"critic_hidden_dim": 128, "polyak": 0.05,
     "learning_rate_actor": 3e-4, "learning_rate_critic": 3e-4},
    {"normalize_return": True},
]

# round 2 of the grid: critic width was the only lever that moved the
# tail (64→128: 0.356→0.401; polyak/n-step/λ/return-norm all flat) —
# refine around it
GRID2 = [
    {"critic_hidden_dim": 128, "total_timesteps": 4_000_000},
    {"critic_hidden_dim": 128, "critic_num_layers": 2},
    {"critic_hidden_dim": 256},
    {"critic_hidden_dim": 128, "learning_rate_critic": 3e-4},
]

# round 3: critic capacity AND critic lr each helped independently
# (128x2-layer: 0.424; 128 + lrc 3e-4: 0.441) — combine them
GRID3 = [
    {"critic_hidden_dim": 128, "critic_num_layers": 2,
     "learning_rate_critic": 3e-4},
    {"critic_hidden_dim": 128, "learning_rate_critic": 5e-4},
    {"critic_hidden_dim": 256, "learning_rate_critic": 3e-4},
    {"critic_hidden_dim": 128, "critic_num_layers": 2,
     "learning_rate_critic": 5e-4},
]

# round 4 (VERDICT r3 next-5): the adopted recipe (critic 128 + lrc
# 3e-4) tails at 0.44. One pass each over the remaining hypotheses:
# λ of the TD(λ) critic target, critic mini-epochs per rollout
# (new critic_epochs knob), and entropy annealing (new anneal_entropy).
_ADOPTED = {"critic_hidden_dim": 128, "learning_rate_critic": 3e-4}
GRID4 = [
    {**_ADOPTED, "td_lambda": 0.5},
    {**_ADOPTED, "td_lambda": 0.95},
    {**_ADOPTED, "critic_epochs": 2},
    {**_ADOPTED, "critic_epochs": 4},
    {**_ADOPTED, "entropy_coef": 0.01, "anneal_entropy": True},
    {**_ADOPTED, "critic_epochs": 4,
     "entropy_coef": 0.01, "anneal_entropy": True},
]


def run_one(overrides: dict) -> dict:
    import jax
    from cleanmarl_tpu.algos.coma import COMAConfig, make_train

    cfg = COMAConfig(**{**BASE, **overrides, "seed": 1})
    init, block, eval_fn, meta = make_train(cfg)
    runner = init(jax.random.PRNGKey(1))
    spb = meta["steps_per_block"]
    num_blocks = max(1, cfg.total_timesteps // spb)
    eval_every = max(1, num_blocks // 40)
    t0 = time.time()
    curve = []
    for b in range(num_blocks):
        runner, metrics = block(runner)
        if (b + 1) % eval_every == 0 or b == num_blocks - 1:
            ev = eval_fn(runner.actor_params, jax.random.PRNGKey(b))
            curve.append(float(ev["eval/ep_reward"]))
    tail = curve[-5:]
    return {
        "overrides": overrides,
        "tail_mean": round(sum(tail) / len(tail), 4),
        "best": round(max(curve), 4),
        "wall_s": round(time.time() - t0, 1),
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        rec = run_one(json.loads(sys.argv[2]))
        print("RESULT " + json.dumps(rec), flush=True)
        return
    grid = GRID
    if "--round2" in sys.argv:
        grid = GRID2
    elif "--round3" in sys.argv:
        grid = GRID3
    elif "--round4" in sys.argv:
        grid = GRID4
    out = open(os.path.join(REPO, "validation", "sweep_coma_lbf.jsonl"), "a")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    for ov in grid:
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one",
                 json.dumps(ov)],
                capture_output=True, text=True, timeout=3600, env=env,
                cwd=REPO,
            )
            rec = {"overrides": ov,
                   "error": p.stdout[-200:] + p.stderr[-200:]}
            for line in p.stdout.splitlines():
                if line.startswith("RESULT "):
                    rec = json.loads(line[len("RESULT "):])
        except subprocess.TimeoutExpired:
            # one slow config must not abort the remaining grid
            rec = {"overrides": ov, "error": "timeout after 3600s"}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
