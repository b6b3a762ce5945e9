"""MADDPG: gumbel-softmax properties + learning smoke test."""
import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.algos.maddpg import MADDPGConfig, gumbel_softmax, make_train
from cleanmarl_tpu.core.networks import MASK_NEG
from cleanmarl_tpu.envs.matrix_game import MatrixGame


def test_gumbel_softmax_hard_is_onehot_with_soft_gradient():
    key = jax.random.PRNGKey(0)
    logits = jnp.array([[2.0, 0.0, -1.0]])
    y = gumbel_softmax(key, logits, hard=True)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-6)
    assert set(np.unique(np.asarray(y))) <= {0.0, 1.0}

    # straight-through: gradient flows as if soft
    def f(lg):
        return gumbel_softmax(key, lg, hard=True)[0, 0]

    g = jax.grad(f)(logits)
    assert np.abs(np.asarray(g)).sum() > 0.0


def test_gumbel_softmax_respects_mask():
    key = jax.random.PRNGKey(0)
    logits = jnp.where(
        jnp.array([[True, False, True]]), jnp.zeros((1, 3)), MASK_NEG
    )
    for i in range(50):
        y = gumbel_softmax(jax.random.PRNGKey(i), logits, hard=True)
        assert float(y[0, 1]) == 0.0  # masked action never sampled


def test_maddpg_learns_matrix_game():
    cfg = MADDPGConfig(
        env_type="matrix",
        num_envs=8,
        buffer_size=512,
        total_timesteps=40_000,
        train_freq=1,
        batch_size=16,
        learning_rate_actor=3e-3,
        learning_rate_critic=3e-3,
        actor_hidden_dim=32,
        critic_hidden_dim=64,
        polyak=0.05,
        log_interval=100,
        num_eval_ep=8,
        seed=0,
    )
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    init, train_block, eval_fn = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    for _ in range(cfg.total_timesteps // (cfg.num_envs * cfg.log_interval)):
        runner, metrics = train_block(runner)
    out = eval_fn(runner.actor_params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 7.2, dict(out)


def test_recurrent_maddpg_learns_matrix_game():
    cfg = MADDPGConfig(
        env_type="matrix", num_envs=8, buffer_size=512,
        total_timesteps=40_000, train_freq=1, batch_size=16,
        recurrent=True, learning_rate_actor=3e-3, learning_rate_critic=3e-3,
        actor_hidden_dim=32, critic_hidden_dim=64, polyak=0.05,
        log_interval=100, num_eval_ep=8, seed=0,
    )
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8, mask_trick=False)
    init, train_block, eval_fn = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    for _ in range(cfg.total_timesteps // (cfg.num_envs * cfg.log_interval)):
        runner, metrics = train_block(runner)
    out = eval_fn(runner.actor_params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 7.0, dict(out)
