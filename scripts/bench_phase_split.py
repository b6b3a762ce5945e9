"""Per-phase wall-time split (rollout vs PPO update) of the bench
config, committed as a perf artifact (validation/bench_phases_r3.json).

Uses the separately-jitted phase timer from ppo_common.make_train —
the production block fuses both phases into one XLA program, so these
numbers are the diagnostic upper bound, not the fused block's exact
internals.
"""
import json

import jax


def main():
    from scripts.check_bench_memory import bench_config
    from cleanmarl_tpu.algos.mappo import make_train

    cfg = bench_config()
    init, train_block, _, meta = make_train(cfg)
    runner = init(jax.random.PRNGKey(0))
    phases = {k: round(float(v), 4)
              for k, v in meta["phase_timer"](runner).items()}
    rec = {
        "config": "bench_config() — north-star recipe, 8192 envs, "
                  "rollout 60, 8 epochs x 8 minibatches",
        **phases,
        "steps_per_rollout": meta["rollout_len"] * cfg.num_envs,
    }
    print(json.dumps(rec))
    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "validation/bench_phases_r3.json"
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
