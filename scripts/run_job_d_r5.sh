#!/bin/bash
# Round-5 TPU job D (after job C): 3s5z stabilization mini-grid, the
# host-env throughput number, then the full 26-config validation matrix
# at round-5 HEAD. Serialized — the TPU is single-claimant.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

R=scripts/mappo_3m_run.py
LEVERS="--death_masking 1 --normalize_values 1"

# 3s5z grid round 3: the annealed+levers winner (tail10 0.856/0.728
# s1/s2) oscillates 0.66-0.97 late — probe stabilizers of the tail:
# tighter clip, more epochs, milder entropy floor, doubled env batch.
python $R --env_name 3s5z --total_timesteps 40000000 $LEVERS \
  --ppo_clip 0.1 --out validation/r5/mappo_3s5z_lever_clip1.jsonl
python $R --env_name 3s5z --total_timesteps 40000000 $LEVERS \
  --epochs 10 --out validation/r5/mappo_3s5z_lever_ep10.jsonl
python $R --env_name 3s5z --total_timesteps 40000000 $LEVERS \
  --entropy_coef 0.005 --out validation/r5/mappo_3s5z_lever_ent005.jsonl
python $R --env_name 3s5z --total_timesteps 40000000 $LEVERS \
  --num_envs 512 --out validation/r5/mappo_3s5z_lever_e512.jsonl

# host io_callback path throughput vs pure-JAX pursuit (VERDICT r4
# weak-7; job B was cut before this step)
python scripts/bench_host_env.py

# full validation matrix at HEAD (26 configs incl. the four new
# hetero-map rows)
python scripts/validate_baselines.py --all
echo JOB_D_DONE
