"""Throughput sweep over north-star bench operating points (round 3).

For each candidate (num_envs, rollout_len, num_minibatches, remat)
around the learning-validated hidden-128/8-epoch recipe: compile the
train block, read the compiler's HBM requirement, time steady-state
blocks, and append one JSON line to validation/bench_sweep_r3.jsonl.
The best point becomes bench.py's config; the guard
(scripts/check_bench_memory.py) then pins its compile memory.
"""
import json
import time

import jax


def measure(overrides, n_timed=3):
    from scripts.check_bench_memory import bench_config
    from cleanmarl_tpu.algos.mappo import make_train

    cfg = bench_config(**overrides)
    init, train_block, _, meta = make_train(cfg)
    runner = init(jax.random.PRNGKey(0))
    # one AOT compile serves both the memory analysis and the timed
    # execution (calling the jitted train_block would recompile)
    t0 = time.perf_counter()
    compiled = train_block.lower(runner).compile()
    compile_s = time.perf_counter() - t0
    mem = compiled.memory_analysis()
    hbm_gb = (
        mem.argument_size_in_bytes + mem.output_size_in_bytes
        + mem.temp_size_in_bytes + mem.generated_code_size_in_bytes
        - mem.alias_size_in_bytes
    ) / 2**30

    runner, metrics = compiled(runner)
    float(metrics["train/actor_loss"])  # force completion
    t0 = time.perf_counter()
    for _ in range(n_timed):
        runner, metrics = compiled(runner)
        float(metrics["train/actor_loss"])
    elapsed = time.perf_counter() - t0
    sps = meta["steps_per_block"] * n_timed / elapsed
    return {
        "overrides": overrides,
        "steps_per_s": round(sps, 1),
        "hbm_gb": round(hbm_gb, 3),
        "compile_s": round(compile_s, 1),
    }


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="validation/bench_sweep_r3.jsonl")
    ap.add_argument("--candidates", default="",
                    help="JSON list of override dicts; default = r3 grid")
    args = ap.parse_args()
    candidates = [
        {"num_envs": 8192, "rollout_len": 60, "num_minibatches": 8},
        {"num_envs": 8192, "rollout_len": 60, "num_minibatches": 4},
        {"num_envs": 8192, "rollout_len": 60, "num_minibatches": 1},
        {"num_envs": 8192, "rollout_len": 150, "num_minibatches": 8},
        {"num_envs": 16384, "rollout_len": 60, "num_minibatches": 8},
        {"num_envs": 16384, "rollout_len": 60, "num_minibatches": 16},
        {"num_envs": 4096, "rollout_len": 60, "num_minibatches": 2},
        {"num_envs": 8192, "rollout_len": 60, "num_minibatches": 1,
         "remat_actor": True},
    ]
    if args.candidates:
        candidates = json.loads(args.candidates)
    out = open(args.out, "a")
    for ov in candidates:
        try:
            rec = measure(ov)
        except Exception as e:
            rec = {"overrides": ov, "error": str(e)[:400]}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
