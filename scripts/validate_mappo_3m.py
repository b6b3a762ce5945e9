"""North-star validation: recurrent MAPPO on the 3m micro-combat map.

Criterion (BASELINE.md): reach the reference win-rate (SMAC 3m solves to
~95%+ battle_won) — here tracked as eval battle_won vs env steps.
Writes a JSONL curve to validation/mappo_rnn_3m.jsonl.
"""
import json, os, time
import jax
from cleanmarl_tpu.algos.mappo import make_train
from cleanmarl_tpu.algos.ppo_common import PPOConfig

os.makedirs("validation", exist_ok=True)
cfg = PPOConfig(
    env_type="smaclite", env_name="3m", agent_ids=True,
    recurrent=True, num_envs=256, rollout_len=60,
    actor_hidden_dim=64, critic_hidden_dim=64,
    learning_rate_actor=5e-4, learning_rate_critic=5e-4,
    entropy_coef=0.003, td_lambda=0.95, epochs=4, anneal_lr=True,
    total_timesteps=20_000_000, log_interval=4,
    num_eval_ep=32, seed=1, verbose=False,
)
init, train_block, eval_fn, meta = make_train(cfg)
runner = init(jax.random.PRNGKey(cfg.seed))
t0 = time.time()
out = open("validation/mappo_rnn_3m.jsonl", "w")
num_blocks = cfg.total_timesteps // meta["steps_per_block"]
for block in range(num_blocks):
    runner, metrics = train_block(runner)
    if (block + 1) % 8 == 0:
        ev = eval_fn(runner.actor_params, jax.random.PRNGKey(block))
        rec = {
            "env_steps": int(runner.step),
            "wall_s": round(time.time() - t0, 1),
            "eval_battle_won": float(ev["eval/battle_won"]),
            "eval_ep_reward": float(ev["eval/ep_reward"]),
            "rollout_ep_reward": float(metrics["rollout/ep_reward"]),
        }
        out.write(json.dumps(rec) + "\n"); out.flush()
        print(rec, flush=True)
        if rec["eval_battle_won"] >= 0.95:
            print("REACHED 95% WIN RATE", flush=True)
            break
out.close()
