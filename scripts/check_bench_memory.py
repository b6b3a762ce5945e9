"""Compile-memory guard for the bench config (VERDICT r2 task 2).

AOT-lowers and compiles the north-star train block for the EXACT config
``bench.py`` runs, reads the compiler's memory analysis, and fails if
the required HBM exceeds the single-v5e budget. Round 2 shipped a bench
config that had never compiled (25.55G needed vs 15.75G available); this
guard makes that class of breakage impossible to commit silently.

Run standalone (``python scripts/check_bench_memory.py``) on the TPU as
part of the round checklist next to pytest. ``--cfg '{...}'`` overrides
bench fields to probe other operating points (used by the bench sweep).

Exit 0 = fits; exit 1 = does not fit (or does not compile).
"""
import argparse
import json
import sys

import jax

# leave headroom below the 15.75G usable HBM of one v5e for runtime
# buffers the analysis may not count
DEFAULT_BUDGET_GB = 15.0


def bench_config(**overrides):
    """The one true bench config — bench.py imports this so the guard
    and the bench can never drift apart."""
    from cleanmarl_tpu.algos.ppo_common import PPOConfig

    base = dict(
        env_type="smaclite",
        env_name="3m",
        agent_ids=True,
        recurrent=True,
        num_envs=8192,
        rollout_len=60,
        actor_hidden_dim=128,
        critic_hidden_dim=128,
        epochs=8,
        num_minibatches=8,
        total_timesteps=1_000_000_000,
        log_interval=2,
        seed=0,
        verbose=False,
    )
    base.update(overrides)
    return PPOConfig(**base)


def compiled_memory_gb(cfg):
    """(total_hbm_gb, breakdown dict) for the compiled train block."""
    from cleanmarl_tpu.algos.mappo import make_train

    init, train_block, _, meta = make_train(cfg)
    runner = jax.eval_shape(init, jax.random.PRNGKey(0))
    compiled = train_block.lower(runner).compile()
    mem = compiled.memory_analysis()
    fields = {
        "argument_size_gb": mem.argument_size_in_bytes / 2**30,
        "output_size_gb": mem.output_size_in_bytes / 2**30,
        "temp_size_gb": mem.temp_size_in_bytes / 2**30,
        "generated_code_size_gb": mem.generated_code_size_in_bytes / 2**30,
        "alias_size_gb": mem.alias_size_in_bytes / 2**30,
    }
    # donated (aliased) inputs don't double-count against HBM
    total = (
        fields["argument_size_gb"]
        + fields["output_size_gb"]
        + fields["temp_size_gb"]
        + fields["generated_code_size_gb"]
        - fields["alias_size_gb"]
    )
    return total, fields, meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget_gb", type=float, default=DEFAULT_BUDGET_GB)
    ap.add_argument("--cfg", type=str, default="{}",
                    help="JSON dict of PPOConfig field overrides")
    args = ap.parse_args()

    cfg = bench_config(**json.loads(args.cfg))
    try:
        total, fields, _ = compiled_memory_gb(cfg)
    except Exception as e:  # XLA raises RuntimeError on allocation failure
        print(json.dumps({"ok": False, "error": str(e)[:2000]}))
        sys.exit(1)
    ok = total <= args.budget_gb
    print(json.dumps({
        "ok": ok,
        "required_hbm_gb": round(total, 3),
        "budget_gb": args.budget_gb,
        **{k: round(v, 3) for k, v in fields.items()},
    }))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
