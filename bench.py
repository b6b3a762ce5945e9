"""Round benchmark: steady-state env-steps/s/chip of the fully-jitted
recurrent MAPPO actor-learner on pure-JAX SMAClite ``3m`` — the
north-star config per /root/repo/BASELINE.md (reference:
mappo_lstm_multienvs.py --env_type=smaclite --env_name=3m).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (AmineAndam04/cleanmarl) is a single-Python-env
CPU loop (device="cpu" default, vdn.py:73; one OS process per env in the
_multienvs variants). Its env-rate on SMAClite-class envs is ~1,000
env-steps/s per process including the per-step torch forward — we use
1,000 as the reference denominator (cannot be measured here: the
pettingzoo-MPE/smaclite wheels are not installed in this image).

Sweep notes (steady-state, one v5e chip):
  MAPPO 3m recurrent: 512 envs → 1.46M, 2048 → 2.12M, 8192 → 2.28M sps
  MAPPO simple_spread ff: 16384 envs → 5.2M sps (peak; 65536 regresses)
"""
from __future__ import annotations

import json
import time

import jax

BASELINE_STEPS_PER_S = 1_000.0


def main():
    from cleanmarl_tpu.algos.mappo import make_train
    from cleanmarl_tpu.algos.ppo_common import PPOConfig

    cfg = PPOConfig(
        env_type="smaclite",
        env_name="3m",
        agent_ids=True,
        recurrent=True,
        num_envs=8192,
        total_timesteps=1_000_000_000,
        log_interval=2,
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
                "metric": "recurrent MAPPO SMAClite-3m env-steps/s/chip",
                "value": round(sps, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / BASELINE_STEPS_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
