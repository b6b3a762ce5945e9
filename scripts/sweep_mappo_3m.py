"""North-star sweep: recurrent MAPPO on 3m, a few candidate recipes.

Each config trains for ``STEPS`` env steps on the real chip and logs an
eval curve to validation/sweep_mappo_3m.jsonl. Goal: find a recipe that
pushes eval battle_won to ~0.95 (the reference-grade 3m win rate).
"""
import json
import os
import time

import jax

from cleanmarl_tpu.algos.mappo import make_train
from cleanmarl_tpu.algos.ppo_common import PPOConfig

STEPS = 10_000_000

BASE = dict(
    env_type="smaclite", env_name="3m", agent_ids=True,
    recurrent=True, num_envs=256, rollout_len=60,
    actor_hidden_dim=64, critic_hidden_dim=64,
    learning_rate_actor=5e-4, learning_rate_critic=5e-4,
    td_lambda=0.95, epochs=4,
    total_timesteps=STEPS, log_interval=4,
    num_eval_ep=64, seed=1, verbose=False,
)

CONFIGS = {
    # the current (plateauing) recipe minus LR annealing
    "A_norm_adv": dict(entropy_coef=0.003, normalize_advantage=True,
                       clip_gradients=10.0),
    # MAPPO-paper-style: higher entropy early, grad clip, adv norm
    "B_ent01": dict(entropy_coef=0.01, normalize_advantage=True,
                    clip_gradients=10.0),
    # bigger brain + batch
    "C_wide": dict(entropy_coef=0.003, normalize_advantage=True,
                   clip_gradients=10.0, actor_hidden_dim=128,
                   critic_hidden_dim=128, num_envs=512),
}

os.makedirs("validation", exist_ok=True)
out = open("validation/sweep_mappo_3m.jsonl", "a")

for name, overrides in CONFIGS.items():
    cfg = PPOConfig(**{**BASE, **overrides})
    init, train_block, eval_fn, meta = make_train(cfg)
    runner = init(jax.random.PRNGKey(cfg.seed))
    t0 = time.time()
    best = 0.0
    num_blocks = cfg.total_timesteps // meta["steps_per_block"]
    for block in range(num_blocks):
        runner, metrics = train_block(runner)
        if (block + 1) % 16 == 0:
            ev = eval_fn(runner.actor_params, jax.random.PRNGKey(block))
            won = float(ev["eval/battle_won"])
            best = max(best, won)
            rec = {
                "config": name,
                "env_steps": int(runner.step),
                "wall_s": round(time.time() - t0, 1),
                "eval_battle_won": won,
                "eval_ep_reward": float(ev["eval/ep_reward"]),
                "rollout_ep_reward": float(metrics["rollout/ep_reward"]),
            }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(rec, flush=True)
            if won >= 0.97:
                break
    print(f"== {name}: best eval battle_won {best}", flush=True)
out.close()
