"""Throughput of the host io_callback env path vs the pure-JAX port.

``envs/external.py`` is the exactness escape hatch: any installed
PettingZoo parallel env runs behind ``io_callback`` at host-env speed
(the TPU-native replacement for the reference's Pipe/Process workers,
vdn_multienvs.py:229-264). This micro-bench quantifies what that
costs — the same VDN acting/training loop on SISL pursuit_v4 through
(a) the host wheel via ``--env_type pz --env_family sisl`` and
(b) the pure-JAX port via ``--env_type pursuit`` — so users see the
gap instead of discovering it (VERDICT r4 weak-7).

Writes one row per path to validation/bench_host_env.jsonl.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_host_env.py
"""
import json
import os
import time

# the SISL wheel imports pygame, which demands a display/runtime dir
# even headless — give it dummies before anything imports it
os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
os.environ.setdefault("SDL_AUDIODRIVER", "dummy")
os.environ.setdefault("XDG_RUNTIME_DIR", "/tmp")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

KW = dict(
    num_envs=16, total_timesteps=1,  # measured manually below
    buffer_size=10_000, batch_size=4, learning_starts=2_000,
    train_freq=1, exploration_fraction=0.5, hidden_dim=64,
    log_interval=50, num_eval_ep=4, verbose=False, seed=1,
)
MEASURE_BLOCKS = 8   # blocks of num_envs*log_interval steps each


def bench(env_type: str, env_family: str = "mpe") -> dict:
    import jax
    from cleanmarl_tpu.algos.vdn import VDNConfig, make_train

    kwargs = dict(KW, env_type=env_type, env_name="pursuit_v4")
    if env_type == "pz":
        kwargs["env_family"] = env_family
    cfg = VDNConfig(**kwargs)
    init, block, _ = make_train(cfg)
    runner = init(jax.random.PRNGKey(1))
    spb = cfg.num_envs * cfg.log_interval
    runner, _ = block(runner)          # warmup: compile + first block
    jax.block_until_ready(runner.step)
    t0 = time.time()
    for _ in range(MEASURE_BLOCKS):
        runner, metrics = block(runner)
    jax.block_until_ready(runner.step)
    dt = time.time() - t0
    return {
        "path": f"{env_type}" + (f"/{env_family}" if env_type == "pz" else ""),
        "backend": jax.devices()[0].platform,
        "steps_per_s": round(MEASURE_BLOCKS * spb / dt, 1),
        "wall_s": round(dt, 2),
        "env_steps": MEASURE_BLOCKS * spb,
    }


def main():
    # One path per invocation, row appended immediately — the two paths
    # want different backends: the pure-JAX port runs on the TPU; the
    # host io_callback path runs on the CPU backend (the host env IS
    # CPU-side Python, and io_callback host round trips are not
    # supported through the remote-TPU tunnel used in this image).
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--path", choices=["pursuit", "host"], default="pursuit")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    row = bench("pursuit") if args.path == "pursuit" else bench("pz", "sisl")
    out_path = os.path.join(REPO, "validation", "bench_host_env.jsonl")
    with open(out_path, "a") as f:
        print(json.dumps(row), flush=True)
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
