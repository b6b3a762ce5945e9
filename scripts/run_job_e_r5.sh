#!/bin/bash
# Round-5 TPU job E (after job D): S11 collision ablation on 3s5z, a
# 128-episode-eval rerun of the winning recipe (cleaner tail estimate
# than the default 32-ep evals), and a bench.py sanity pass at HEAD.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

R=scripts/mappo_3m_run.py
LEVERS="--death_masking 1 --normalize_values 1"

# does pairwise collision blocking (the remaining S11 fidelity delta)
# change what 3s5z rewards? ablation vs the committed no-collision twin
python $R --env_name 3s5z --total_timesteps 40000000 $LEVERS \
  --unit_collisions 1 --out validation/r5/mappo_3s5z_lever_coll.jsonl

# winner recipe, 128-episode evals: tail estimate with ~2x less eval
# noise (sigma ~0.03 vs 0.06 per point)
python $R --env_name 3s5z --total_timesteps 40000000 $LEVERS \
  --num_eval_ep 128 --out validation/r5/mappo_3s5z_lever_eval128.jsonl

# simple_reference full validation (2M steps, the CPU smoke's recipe)
python - <<'PYEOF'
import json, time, jax
from cleanmarl_tpu.algos.mappo import make_train
from cleanmarl_tpu.algos.ppo_common import PPOConfig

cfg = PPOConfig(env_type="mpe", env_name="simple_reference_v3",
                num_envs=64, total_timesteps=2_000_000,
                learning_rate_actor=5e-4, learning_rate_critic=5e-4,
                entropy_coef=0.01, anneal_entropy=True, epochs=4,
                normalize_advantage=True, log_interval=8,
                num_eval_ep=64, seed=1, verbose=False)
init, block, ev, meta = make_train(cfg)
runner = init(jax.random.PRNGKey(1))
spb = meta["steps_per_block"]
t0 = time.time()
with open("validation/r5/mappo_reference.jsonl", "w") as out:
    n = cfg.total_timesteps // spb
    for b in range(n):
        runner, metrics = block(runner)
        if (b + 1) % max(1, n // 40) == 0 or b == n - 1:
            e = ev(runner.actor_params, jax.random.PRNGKey(b))
            out.write(json.dumps({
                "env_steps": int(runner.step),
                "wall_s": round(time.time() - t0, 1),
                "eval_ep_reward": float(e["eval/ep_reward"]),
                "rollout_ep_reward": float(metrics["rollout/ep_reward"]),
            }) + "\n"); out.flush()
PYEOF

# host io_callback throughput (fixed SDL/XDG env; crashed in job D)
python scripts/bench_host_env.py

python bench.py
echo JOB_E_DONE
