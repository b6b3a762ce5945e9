"""QMIX throughput at large env batches with the bounded update cadence
(VERDICT r2 next-4 done-criterion: steps/s at >=1024 envs).

Per-iteration cost of the episode-cadence algorithms used to scan
num_envs conditional update slots; with max_updates_per_iter=k the scan
is k slots and the surplus carries as debt. This measures steady-state
env-steps/s on SMAClite 3m at 1024/4096 envs, capped vs uncapped, and
appends JSON lines to validation/qmix_cap_throughput_r3.jsonl.

Replay-ratio caveat (borne out by this script's own data): when the
steady-state due-rate exceeds the cap — as it does on 3m at ≥1024 envs
with train_freq=1 — the debt grows without bound and the effective
updates/episode IS reduced; the cap is then a throughput guard, and the
correct configuration scales train_freq with the env batch
(core/cadence.py). Below the cap the schedules are bit-identical
(tests/test_cadence.py). ``train/update_debt`` is logged so overload is
visible at runtime.
"""
import json
import time

import jax


def measure(num_envs: int, cap: int, n_blocks: int = 3):
    from cleanmarl_tpu.algos.qmix import QMIXConfig, make_train

    cfg = QMIXConfig(
        env_type="smaclite", env_name="3m", agent_ids=True,
        num_envs=num_envs, buffer_size=5000, batch_size=32,
        train_freq=1, hidden_dim=64, max_updates_per_iter=cap,
        total_timesteps=10**9, log_interval=50, seed=0, verbose=False,
    )
    init, block, _ = make_train(cfg)
    r = init(jax.random.PRNGKey(0))
    r, m = block(r)
    float(m["train/loss"])
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        r, m = block(r)
        float(m["train/loss"])
    dt = time.perf_counter() - t0
    sps = cfg.num_envs * cfg.log_interval * n_blocks / dt
    return {
        "num_envs": num_envs, "max_updates_per_iter": cap,
        "steps_per_s": round(sps, 1),
        "num_updates": float(r.num_updates),
        "update_debt": int(r.update_debt),
        "episodes": int(r.episodes),
    }


def main():
    out = open("validation/qmix_cap_throughput_r3.jsonl", "a")
    for num_envs, cap in [(1024, 0), (1024, 8), (4096, 8), (4096, 0)]:
        try:
            rec = measure(num_envs, cap)
        except Exception as e:
            rec = {"num_envs": num_envs, "max_updates_per_iter": cap,
                   "error": str(e)[:300]}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
