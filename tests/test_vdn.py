"""VDN unit + learning smoke tests.

The TD-target fixture is hand-computed (SURVEY.md §4's prescription);
the smoke test demands the greedy policy solves MatrixGame."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleanmarl_tpu.algos.vdn import VDNConfig, make_train
from cleanmarl_tpu.envs.matrix_game import MatrixGame


def smoke_cfg(**kw):
    base = dict(
        env_type="matrix",
        num_envs=8,
        buffer_size=4096,
        total_timesteps=30_000,
        learning_starts=500,
        train_freq=1,
        batch_size=16,
        learning_rate=3e-3,
        exploration_fraction=0.3,
        hidden_dim=32,
        num_layers=1,
        target_network_update_freq=1,
        polyak=0.05,
        log_interval=100,
        num_eval_ep=8,
        seed=0,
        # MatrixGame obs carry no time feature: episodic targets (the
        # stabilizing default) alias the same obs to position-dependent
        # values; the reference's infinite-horizon semantics are
        # consistent here and reach the optimum
        bootstrap_truncation=True,
    )
    base.update(kw)
    return VDNConfig(**base)


def test_vdn_learns_matrix_game():
    cfg = smoke_cfg()
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    init, train_block, eval_fn = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    num_blocks = cfg.total_timesteps // (cfg.num_envs * cfg.log_interval)
    for _ in range(num_blocks):
        runner, metrics = train_block(runner)
    out = eval_fn(runner.params, jax.random.PRNGKey(1))
    # optimal return = episode_limit = 8; demand ≥ 90%
    assert float(out["eval/ep_reward"]) > 7.2, dict(out)


def test_vdn_block_metrics_structure():
    cfg = smoke_cfg(total_timesteps=2000)
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    init, train_block, eval_fn = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    runner, metrics = train_block(runner)
    for k in (
        "rollout/ep_reward",
        "rollout/ep_length",
        "rollout/epsilon",
        "rollout/num_episodes",
        "train/loss",
        "train/grads",
        "train/num_updates",
    ):
        assert k in metrics
    # 100 iters → ⌊100/8⌋ = 12 complete episodes per env × 8 envs = 96
    assert float(metrics["rollout/num_episodes"]) == 96.0
    assert float(metrics["rollout/ep_length"]) == 8.0
