#!/bin/bash
# Round-5 TPU job C: spend the Pallas HBM dividend at 27-agent scale
# (VERDICT r4 next-4). The round-4 sweep showed the fused GRU kernel
# cuts compiled HBM 18.2G -> 13.2G on the 27m_vs_30m shape; this job
# converts that into measured time-to-0.95 battle_won: xla vs pallas at
# the validated 512-env operating point, then a 1024-env pallas run the
# headroom pays for. stop_at 0.95 makes each run cost only its
# time-to-target.
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

R=scripts/mappo_3m_run.py
PAPER="--epochs 10 --ppo_clip 0.05 --anneal_lr 0 --anneal_entropy 0 --death_masking 1 --normalize_values 1"

# ---- 3s5z/2s3z close-out (the one map still <0.9): the round-5 winner
# so far is annealed recipe + death_masking/normalize_values under the
# new per-type speeds (tail10 0.856, best 0.97 at 40M). Probe the two
# obvious levers: budget (80M: longer anneal = longer exploration) and
# the MAPPO-paper easy-map settings (clip 0.2, 5 epochs, constant lr).
LEVERS="--death_masking 1 --normalize_values 1"
python $R --env_name 3s5z --total_timesteps 80000000 $LEVERS \
  --out validation/r5/mappo_3s5z_lever80_speed.jsonl
python $R --env_name 3s5z --total_timesteps 40000000 $LEVERS --seed 2 \
  --out validation/r5/mappo_3s5z_lever_s2_speed.jsonl
python $R --env_name 3s5z --total_timesteps 40000000 $LEVERS \
  --epochs 5 --anneal_lr 0 --anneal_entropy 0 \
  --out validation/r5/mappo_3s5z_paper5_speed.jsonl
python $R --env_name 2s3z --total_timesteps 40000000 $LEVERS \
  --out validation/r5/mappo_2s3z_lever_speed.jsonl

python $R --env_name 27m_vs_30m --num_envs 512 --total_timesteps 25000000 \
  $PAPER --gru_impl xla --stop_at 0.95 \
  --out validation/r5/mappo_27m30m_xla_tt95.jsonl
python $R --env_name 27m_vs_30m --num_envs 512 --total_timesteps 25000000 \
  $PAPER --gru_impl pallas --stop_at 0.95 \
  --out validation/r5/mappo_27m30m_pallas_tt95.jsonl
python $R --env_name 27m_vs_30m --num_envs 1024 --total_timesteps 25000000 \
  $PAPER --gru_impl pallas --stop_at 0.95 \
  --out validation/r5/mappo_27m30m_pallas1024_tt95.jsonl
python $R --env_name 27m_vs_30m --num_envs 1024 --total_timesteps 25000000 \
  $PAPER --gru_impl xla --stop_at 0.95 \
  --out validation/r5/mappo_27m30m_xla1024_tt95.jsonl
echo JOB_C_DONE
