"""One north-star training run: recurrent MAPPO on 3m, parameterized.

Writes a JSONL curve; prints a final summary line
``RESULT {json}`` with the best/final eval battle_won. Used standalone
and as the subprocess unit of sweep_mappo_3m.py (one JAX process per
config — a backend failure kills one run, not the sweep).
"""
import argparse
import json
import os
import time

import jax

from cleanmarl_tpu.algos.mappo import make_train
from cleanmarl_tpu.algos.ppo_common import PPOConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="validation/mappo_rnn_3m.jsonl")
    ap.add_argument("--env_name", default="3m")
    ap.add_argument("--total_timesteps", type=int, default=20_000_000)
    ap.add_argument("--num_envs", type=int, default=256)
    ap.add_argument("--rollout_len", type=int, default=60)
    # Defaults = the ROBUST recipe from the round-2/3 sweeps
    # (validation/sweep_mappo_3m.jsonl + mappo_rnn_3m_e01_s*.jsonl):
    # hidden 128, 8 epochs, advantage norm, lr 5e-4 annealed, entropy
    # 0.01 annealed to 0 → sustained tail 0.91/0.94/0.96 on seeds
    # 1/2/3. Entropy 0.003 is higher-variance: best single seed 0.98
    # (the committed mappo_rnn_3m.jsonl headline curve) but 0.81 on its
    # worst seed — the higher initial entropy prevents committing to a
    # weak basin before the anneal ends.
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--entropy_coef", type=float, default=0.01)
    ap.add_argument("--anneal_entropy", type=int, default=1)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--td_lambda", type=float, default=0.95)
    ap.add_argument("--normalize_advantage", type=int, default=1)
    ap.add_argument("--normalize_reward", type=int, default=0)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--tbptt", type=int, default=0)
    ap.add_argument("--anneal_lr", type=int, default=1)
    ap.add_argument("--num_eval_ep", type=int, default=32)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--compute_dtype", default="float32")
    ap.add_argument("--num_minibatches", type=int, default=1)
    ap.add_argument("--death_masking", type=int, default=0)
    ap.add_argument("--normalize_values", type=int, default=0)
    ap.add_argument("--ppo_clip", type=float, default=0.2)
    ap.add_argument("--gru_impl", default="auto")
    ap.add_argument("--stop_at", type=float, default=2.0)  # >1 → never stop early
    # S11 ablation lever (ENVS_FIDELITY.md): pairwise unit collisions
    ap.add_argument("--unit_collisions", type=int, default=0)
    args = ap.parse_args()

    cfg = PPOConfig(
        env_type="smaclite", env_name=args.env_name, agent_ids=True,
        recurrent=True, num_envs=args.num_envs, rollout_len=args.rollout_len,
        actor_hidden_dim=args.hidden, critic_hidden_dim=args.hidden,
        learning_rate_actor=args.lr, learning_rate_critic=args.lr,
        entropy_coef=args.entropy_coef, td_lambda=args.td_lambda,
        anneal_entropy=bool(args.anneal_entropy),
        epochs=args.epochs, anneal_lr=bool(args.anneal_lr),
        normalize_advantage=bool(args.normalize_advantage),
        normalize_reward=bool(args.normalize_reward),
        tbptt=args.tbptt,
        compute_dtype=args.compute_dtype,
        num_minibatches=args.num_minibatches,
        death_masking=bool(args.death_masking),
        normalize_values=bool(args.normalize_values),
        ppo_clip=args.ppo_clip, gru_impl=args.gru_impl,
        total_timesteps=args.total_timesteps, log_interval=4,
        num_eval_ep=args.num_eval_ep, seed=args.seed, verbose=False,
    )
    env = None
    if args.unit_collisions:
        from cleanmarl_tpu.envs import smaclite
        from cleanmarl_tpu.envs.wrappers import AgentIDWrapper

        env = AgentIDWrapper(
            smaclite.make(args.env_name, unit_collisions=True)
        )
    init, train_block, eval_fn, meta = make_train(cfg, env=env)
    runner = init(jax.random.PRNGKey(cfg.seed))
    t0 = time.time()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    out = open(args.out, "w")
    best, final = 0.0, 0.0
    num_blocks = cfg.total_timesteps // meta["steps_per_block"]
    for block in range(num_blocks):
        runner, metrics = train_block(runner)
        if (block + 1) % 8 == 0 or block == num_blocks - 1:
            ev = eval_fn(runner.actor_params, jax.random.PRNGKey(block))
            final = float(ev["eval/battle_won"])
            best = max(best, final)
            rec = {
                "env_steps": int(runner.step),
                "wall_s": round(time.time() - t0, 1),
                "eval_battle_won": final,
                "eval_ep_reward": float(ev["eval/ep_reward"]),
                "rollout_ep_reward": float(metrics["rollout/ep_reward"]),
            }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            if final >= args.stop_at:
                break
    out.close()
    print("RESULT " + json.dumps(
        {"best": best, "final": final, "wall_s": round(time.time() - t0, 1),
         "config": vars(args)}
    ), flush=True)


if __name__ == "__main__":
    main()
