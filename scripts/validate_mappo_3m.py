"""North-star validation: recurrent MAPPO on the 3m micro-combat map.

Criterion (BASELINE.md): reach the reference win-rate (SMAC 3m solves to
~95%+ battle_won) — tracked as eval battle_won vs env steps.

Thin alias for scripts/mappo_3m_run.py, whose DEFAULTS are the recipe
that sustains eval battle_won 0.97-0.99 across seeds (round-2 sweeps,
validation/sweep_mappo_3m.jsonl): entropy 0.003 annealed to 0, 8 PPO
epochs, advantage normalization, lr 5e-4 annealed, hidden 128,
256 envs × 60-step rollouts, 20M env steps.
"""
import sys

from mappo_3m_run import main

if __name__ == "__main__":
    sys.argv = [sys.argv[0], "--stop_at", "0.95", *sys.argv[1:]]
    main()
