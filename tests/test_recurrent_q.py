"""Recurrent VDN/QMIX learning smoke tests."""
import jax
import numpy as np

from cleanmarl_tpu.algos.recurrent_q import RecurrentQConfig, make_train
from cleanmarl_tpu.envs.matrix_game import MatrixGame


def rnn_cfg(**kw):
    base = dict(
        env_type="matrix",
        num_envs=8,
        buffer_size=512,
        total_timesteps=40_000,
        train_freq=1,
        batch_size=16,
        learning_rate=3e-3,
        exploration_fraction=0.3,
        hidden_dim=32,
        hyper_dim=32,
        embed_dim=16,
        polyak=0.05,
        log_interval=100,
        num_eval_ep=8,
        seed=0,
    )
    base.update(kw)
    return RecurrentQConfig(**base)


def run(cfg, env):
    init, train_block, eval_fn = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    for _ in range(cfg.total_timesteps // (cfg.num_envs * cfg.log_interval)):
        runner, metrics = train_block(runner)
    return runner, eval_fn, metrics


def test_recurrent_vdn_learns_matrix_game():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    runner, eval_fn, metrics = run(rnn_cfg(mixing="vdn"), env)
    out = eval_fn(runner.params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 7.2, dict(out)


def test_recurrent_qmix_learns_matrix_game():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    runner, eval_fn, metrics = run(rnn_cfg(mixing="qmix"), env)
    out = eval_fn(runner.params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 7.2, dict(out)


def test_tbptt_variant_runs():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = rnn_cfg(mixing="qmix", tbptt=4, total_timesteps=2000)
    runner, eval_fn, metrics = run(cfg, env)
    assert np.isfinite(float(metrics["train/loss"]))
    assert float(runner.num_updates) > 0


def test_hidden_state_resets_between_episodes():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = rnn_cfg(total_timesteps=2000, log_interval=8)  # 8 iters = 1 episode
    init, train_block, eval_fn = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    runner, _ = train_block(runner)
    # all envs ended exactly at the block boundary → h reset to zeros
    assert float(np.abs(np.asarray(runner.h)).sum()) == 0.0


def test_sequence_replay_qmix_guard_message():
    import pytest

    cfg = RecurrentQConfig(env_type="matrix", replay="sequence", mixing="qmix")
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    with pytest.raises(ValueError, match="mixing vdn"):
        make_train(cfg, env)
