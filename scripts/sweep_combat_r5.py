"""Combat-map validation grids for COMA / FACMAC / MADDPG (VERDICT r4 next-1).

The reference ships COMA and FACMAC defaulting to SMAClite ``3m``
(/root/reference/cleanmarl/coma.py:20-22, facmac.py:20-22) and MADDPG to
``27m_vs_30m`` (maddpg.py:19-21), yet through round 4 these three
families only had committed learning evidence on MPE/LBF. This grid
closes that hole: each cell trains on 3m and records the eval
battle_won curve to validation/r5/<cell>.jsonl plus a summary row in
validation/sweep_combat_r5.jsonl.

One subprocess per cell (a backend failure costs one run, and the TPU
is single-claimant — serialize everything through this one process).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/sweep_combat_r5.py [--round2]
  PYTHONPATH=... python scripts/sweep_combat_r5.py --one NAME   # run one cell
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMA_BASE = dict(
    env_type="smaclite", env_name="3m",
    num_envs=64, total_timesteps=2_000_000,
    actor_hidden_dim=64, critic_hidden_dim=128,
    learning_rate_actor=5e-4, learning_rate_critic=5e-4,
    td_lambda=0.8, normalize_advantage=True,
    entropy_coef=0.001, start_e=0.5, end_e=0.002,
    # one update per rollout block (episode_limit 150 x 64 envs = 9.6k
    # steps) -> ~208 updates over 2M steps; anneal over the first half
    exploration_fraction=100.0,
    log_interval=8, num_eval_ep=64, verbose=False,
)
FACMAC_BASE = dict(
    env_type="smaclite", env_name="3m",
    num_envs=64, total_timesteps=2_000_000,
    buffer_size=5_000, batch_size=32, train_freq=1,
    learning_rate_actor=8e-4, learning_rate_critic=8e-4,
    actor_hidden_dim=64, critic_hidden_dim=64, hyper_dim=64,
    polyak=0.005, exploration_fraction=750.0,
    max_updates_per_iter=8, log_interval=50, num_eval_ep=64,
    verbose=False,
)
MADDPG_BASE = dict(
    env_type="smaclite", env_name="3m",
    num_envs=64, total_timesteps=2_000_000,
    buffer_size=5_000, batch_size=32, train_freq=1,
    learning_rate_actor=3e-4, learning_rate_critic=3e-4,
    actor_hidden_dim=64, critic_hidden_dim=128,
    normalize_reward=True,
    max_updates_per_iter=8, log_interval=50, num_eval_ep=64,
    verbose=False,
)

# name -> (algo, base, overrides)
CELLS = {
    # COMA: reference-default-shaped recipe (coma.py:20-77), FF + GRU
    "coma_3m_ff":      ("coma", COMA_BASE, {}),
    "coma_3m_rnn":     ("coma", COMA_BASE, {"recurrent": True}),
    "coma_3m_rnn_ent": ("coma", COMA_BASE,
                        {"recurrent": True, "entropy_coef": 0.01,
                         "anneal_entropy": True}),
    "coma_3m_rnn_lowe": ("coma", COMA_BASE,
                         {"recurrent": True, "entropy_coef": 0.003,
                          "exploration_fraction": 50.0}),
    # FACMAC: reference defaults (facmac.py:20-77) scaled to 64 envs
    "facmac_3m_ref":   ("facmac", FACMAC_BASE, {}),
    "facmac_3m_wide":  ("facmac", FACMAC_BASE,
                        {"learning_rate_actor": 5e-4,
                         "learning_rate_critic": 5e-4,
                         "critic_hidden_dim": 128}),
    "facmac_3m_b64":   ("facmac", FACMAC_BASE,
                        {"batch_size": 64, "learning_rate_actor": 5e-4,
                         "learning_rate_critic": 5e-4}),
    # MADDPG: reference defaults (maddpg.py:17-76; lr 3e-4,
    # normalize_reward on); 3m before its 27m_vs_30m flagship
    "maddpg_3m_ref":   ("maddpg", MADDPG_BASE, {}),
    "maddpg_3m_lr5":   ("maddpg", MADDPG_BASE,
                        {"learning_rate_actor": 5e-4,
                         "learning_rate_critic": 5e-4}),
    "maddpg_3m_rnn":   ("maddpg", MADDPG_BASE, {"recurrent": True}),
}

# round 2: round-1 found COMA-FF at 0.80 tail / FACMAC-ref at 0.88 in
# 2M steps — replicate on a second seed and extend the budget; the
# recurrent COMA cells stalled at ~0.2 in 208 updates, so give the GRU
# actor a longer run with a slower anneal
CELLS2 = {
    "coma_3m_ff_s2":    ("coma", COMA_BASE, {"seed": 2}),
    "coma_3m_ff_4m":    ("coma", COMA_BASE,
                         {"total_timesteps": 4_000_000,
                          "exploration_fraction": 200.0}),
    "coma_3m_rnn_4m":   ("coma", COMA_BASE,
                         {"recurrent": True, "total_timesteps": 4_000_000,
                          "exploration_fraction": 200.0}),
    "coma_3m_rnn_lra3": ("coma", COMA_BASE,
                         {"recurrent": True, "total_timesteps": 4_000_000,
                          "learning_rate_actor": 3e-4,
                          "exploration_fraction": 200.0}),
    "facmac_3m_b64_s2": ("facmac", FACMAC_BASE,
                         {"batch_size": 64, "learning_rate_actor": 5e-4,
                          "learning_rate_critic": 5e-4, "seed": 2}),
    "maddpg_3m_ref_s2": ("maddpg", MADDPG_BASE, {"seed": 2}),
}


def run_one(name: str) -> dict:
    import jax

    algo, base, ov = ALL_CELLS[name]
    kwargs = {**base, **ov}
    kwargs.setdefault("seed", 1)
    seed = kwargs["seed"]
    if algo == "coma":
        from cleanmarl_tpu.algos.coma import COMAConfig, make_train
        cfg = COMAConfig(**kwargs)
        init, block, eval_fn, meta = make_train(cfg)
        spb = meta["steps_per_block"]
    elif algo == "facmac":
        from cleanmarl_tpu.algos.facmac import FACMACConfig, make_train
        cfg = FACMACConfig(**kwargs)
        init, block, eval_fn = make_train(cfg)
        spb = cfg.num_envs * cfg.log_interval
    elif algo == "maddpg":
        from cleanmarl_tpu.algos.maddpg import MADDPGConfig, make_train
        cfg = MADDPGConfig(**kwargs)
        init, block, eval_fn = make_train(cfg)
        spb = cfg.num_envs * cfg.log_interval
    else:
        raise ValueError(algo)

    runner = init(jax.random.PRNGKey(seed))
    num_blocks = max(1, cfg.total_timesteps // spb)
    eval_every = max(1, num_blocks // 40)
    out_dir = os.path.join(REPO, "validation", "r5")
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    curve = []
    with open(os.path.join(out_dir, f"{name}.jsonl"), "w") as out:
        for b in range(num_blocks):
            runner, metrics = block(runner)
            if (b + 1) % eval_every == 0 or b == num_blocks - 1:
                ev = eval_fn(runner.actor_params, jax.random.PRNGKey(b))
                rec = {
                    "env_steps": (b + 1) * spb,
                    "wall_s": round(time.time() - t0, 1),
                    "eval_battle_won": float(ev["eval/battle_won"]),
                    "eval_ep_reward": float(ev["eval/ep_reward"]),
                }
                curve.append(rec["eval_battle_won"])
                out.write(json.dumps(rec) + "\n")
                out.flush()
    tail = curve[-5:]
    return {
        "cell": name,
        "tail_mean": round(sum(tail) / len(tail), 4),
        "best": round(max(curve), 4),
        "wall_s": round(time.time() - t0, 1),
    }


ALL_CELLS = {**CELLS, **CELLS2}


def main():
    if "--one" in sys.argv:
        rec = run_one(sys.argv[sys.argv.index("--one") + 1])
        print("RESULT " + json.dumps(rec), flush=True)
        return
    cells = CELLS2 if "--round2" in sys.argv else CELLS
    out = open(os.path.join(REPO, "validation", "sweep_combat_r5.jsonl"), "a")
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    for name in cells:
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", name],
                capture_output=True, text=True, timeout=3600, env=env,
                cwd=REPO,
            )
            rec = {"cell": name, "error": p.stdout[-200:] + p.stderr[-300:]}
            for line in p.stdout.splitlines():
                if line.startswith("RESULT "):
                    rec = json.loads(line[len("RESULT "):])
        except subprocess.TimeoutExpired:
            rec = {"cell": name, "error": "timeout after 3600s"}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()
    out.close()


if __name__ == "__main__":
    main()
