"""Round benchmark: steady-state env-steps/s/chip of the fully-jitted
MAPPO actor-learner on pure-JAX simple_spread (north-star family per
/root/repo/BASELINE.md; switches to SMAClite 3m when that port lands).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (AmineAndam04/cleanmarl) is a single-Python-env
CPU loop (device="cpu" default, vdn.py:73; one process per env in the
_multienvs variants). Its env-rate on MPE-class envs is ~1,000
env-steps/s per process including the per-step torch forward — we use
1,000 as the reference denominator (cannot be measured here: the
pettingzoo-MPE/smaclite wheels are not installed in this image).
"""
from __future__ import annotations

import json
import time

import jax

BASELINE_STEPS_PER_S = 1_000.0


def main():
    from cleanmarl_tpu.algos.mappo import make_train
    from cleanmarl_tpu.algos.ppo_common import PPOConfig

    num_envs = 16384   # sweep: 1024→3.2M, 4096→4.5M, 16384→5.2M steps/s
    log_interval = 10
    cfg = PPOConfig(
        env_type="mpe",
        env_name="simple_spread_v3",
        agent_ids=True,
        num_envs=num_envs,
        total_timesteps=10_000_000,
        log_interval=log_interval,
        seed=0,
        verbose=False,
    )
    init, train_block, eval_fn, meta = make_train(cfg)
    runner = init(jax.random.PRNGKey(0))

    # compile + warm up (the float() host transfer forces real completion:
    # block_until_ready alone does not synchronize on the remote platform)
    runner, metrics = train_block(runner)
    float(metrics["train/actor_loss"])

    # steady state
    n_timed = 3
    t0 = time.perf_counter()
    for _ in range(n_timed):
        runner, metrics = train_block(runner)
        float(metrics["train/actor_loss"])
    elapsed = time.perf_counter() - t0

    steps = meta["steps_per_block"] * n_timed
    sps = steps / elapsed
    print(
        json.dumps(
            {
                "metric": "MAPPO simple_spread env-steps/s/chip",
                "value": round(sps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / BASELINE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
