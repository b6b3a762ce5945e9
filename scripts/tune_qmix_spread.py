"""Ad-hoc stabilizer sweep for QMIX @ simple_spread (divergence after
exploration end — validate_baselines.py run 1). Subprocess-free: pure
CPU, one config at a time, short budgets; writes one JSONL line per
config to validation/tune_qmix_spread.jsonl.
"""
import itertools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from cleanmarl_tpu.algos.qmix import QMIXConfig, make_train  # noqa: E402

BASE = dict(
    env_type="mpe", env_name="simple_spread_v3",
    num_envs=32, total_timesteps=1_000_000,
    buffer_size=5_000, batch_size=32,
    exploration_fraction=0.1, hidden_dim=64,
    log_interval=40, num_eval_ep=64, verbose=False, seed=1,
)

GRID = [
    dict(clip_gradients=10.0),
    dict(clip_gradients=10.0, learning_rate=2.5e-4),
    dict(clip_gradients=10.0, end_e=0.1),
    dict(clip_gradients=10.0, learning_rate=2.5e-4, polyak=0.005),
    dict(learning_rate=2.5e-4),
]


def run(overrides):
    cfg = QMIXConfig(**{**BASE, **overrides})
    init, block, ev = make_train(cfg)
    runner = init(jax.random.PRNGKey(cfg.seed))
    spb = cfg.num_envs * cfg.log_interval
    num_blocks = cfg.total_timesteps // spb
    eval_every = max(1, num_blocks // 20)
    curve = []
    t0 = time.time()
    for b in range(num_blocks):
        runner, _ = block(runner)
        if (b + 1) % eval_every == 0 or b == num_blocks - 1:
            out = ev(runner.params, jax.random.PRNGKey(b))
            curve.append(round(float(out["eval/ep_reward"]), 2))
    tail = curve[-4:]
    return {"overrides": overrides, "tail_mean": round(sum(tail) / len(tail), 2),
            "best": max(curve), "curve": curve,
            "wall_s": round(time.time() - t0, 1)}


def main():
    out = open(os.path.join(REPO, "validation", "tune_qmix_spread.jsonl"), "a")
    for overrides in GRID:
        res = run(overrides)
        out.write(json.dumps(res) + "\n")
        out.flush()
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
