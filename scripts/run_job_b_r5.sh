#!/bin/bash
# Round-5 TPU job B: hetero-map re-validation under per-type speeds
# (ENVS_FIDELITY S3 closed), combat-grid round 2, MADDPG-SL seed
# replicates, host-env throughput. Serialized — the TPU is
# single-claimant (one JAX process at a time).
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

R=scripts/mappo_3m_run.py
# hetero maps, annealed north-star recipe (the better recipe there)
python $R --env_name 3s5z --total_timesteps 40000000 --out validation/r5/mappo_3s5z_speed.jsonl
python $R --env_name 2s3z --total_timesteps 40000000 --out validation/r5/mappo_2s3z_speed.jsonl
python $R --env_name MMM  --total_timesteps 40000000 --out validation/r5/mappo_mmm_speed.jsonl
python $R --env_name MMM2 --total_timesteps 60000000 --out validation/r5/mappo_mmm2_speed.jsonl
# 3s5z, paper hard-map recipe + levers (did NOT transfer pre-speed:
# 0.53-0.75; re-test now that stalker kiting exists)
python $R --env_name 3s5z --total_timesteps 40000000 \
  --epochs 10 --ppo_clip 0.05 --anneal_lr 0 --anneal_entropy 0 \
  --death_masking 1 --normalize_values 1 \
  --out validation/r5/mappo_3s5z_paper_speed.jsonl
# 3s5z, annealed recipe + levers (new combination)
python $R --env_name 3s5z --total_timesteps 40000000 \
  --death_masking 1 --normalize_values 1 \
  --out validation/r5/mappo_3s5z_lever_speed.jsonl

# combat grid round 2 (COMA/FACMAC refinements)
python scripts/sweep_combat_r5.py --round2

# MADDPG-FF speaker_listener seed replicates (threshold-tightening
# evidence, VERDICT r4 weak-3/next-5)
python scripts/validate_baselines.py --config maddpg_sl --seed 2
mv validation/maddpg_sl.jsonl validation/r5/maddpg_sl_s2.jsonl
python scripts/validate_baselines.py --config maddpg_sl --seed 3
mv validation/maddpg_sl.jsonl validation/r5/maddpg_sl_s3.jsonl
git checkout -- validation/maddpg_sl.jsonl   # restore the seed-1 artifact

# host io_callback path throughput vs pure-JAX pursuit
python scripts/bench_host_env.py
echo JOB_B_DONE
