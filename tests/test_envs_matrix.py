import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.envs.matrix_game import MatrixGame
from cleanmarl_tpu.envs.wrappers import AgentIDWrapper


def test_matrix_game_optimal_play():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=4)
    key = jax.random.PRNGKey(0)
    state, ts = env.reset(key)
    total = 0.0
    for t in range(4):
        g = t % 3
        state, ts = env.step(state, jnp.array([g, g]), key)
        total += float(ts.reward)
    assert total == 4.0
    assert bool(ts.truncated) and not bool(ts.done)


def test_matrix_game_avail_mask():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=6)
    state, ts = env.reset(jax.random.PRNGKey(0))
    # t=0 (even): all available
    assert bool(jnp.all(ts.avail))
    state, ts = env.step(state, jnp.array([0, 0]), jax.random.PRNGKey(1))
    # t=1 (odd): action (g+1)%3 = 2 blocked, target g=1 available
    assert not bool(ts.avail[0, 2])
    assert bool(ts.avail[0, 1])


def test_matrix_game_jackpot_termination():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8, done_on_jackpot=True)
    state, ts = env.reset(jax.random.PRNGKey(0))
    state, ts = env.step(state, jnp.array([0, 0]), jax.random.PRNGKey(1))
    assert bool(ts.done)
    assert float(ts.reward) == 2.0  # 1.0 team hit + 1.0 jackpot bonus


def test_vecenv_autoreset_preserves_final_obs():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=2)
    vec = VecEnv(env, num_envs=3)
    key = jax.random.PRNGKey(0)
    state, ts = vec.reset(key)
    a = jnp.zeros((3, 2), jnp.int32)
    state, ts, final = vec.step(state, a, key)          # t=1
    state, ts, final = vec.step(state, a, key)          # t=2 → truncates
    assert bool(jnp.all(ts.truncated))
    # after auto-reset the live obs shows t=0 (target one-hot index 0)
    np.testing.assert_allclose(np.asarray(ts.obs[:, 0, 0]), 1.0)
    # the final (pre-reset) obs shows t=2 → one-hot index 2
    np.testing.assert_allclose(np.asarray(final.obs[:, 0, 2]), 1.0)


def test_agent_id_wrapper():
    env = AgentIDWrapper(MatrixGame(n_agents=3, n_actions=2))
    assert env.obs_dim == 2 + 3
    state, ts = env.reset(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(ts.obs[:, 2:]), np.eye(3))


def test_env_sample_respects_avail():
    env = MatrixGame(n_agents=2, n_actions=3)
    state, ts = env.reset(jax.random.PRNGKey(0))
    state, ts = env.step(state, jnp.array([0, 0]), jax.random.PRNGKey(1))  # odd t
    for i in range(20):
        a = env.sample(jax.random.PRNGKey(i), ts.avail)
        assert bool(jnp.all(jnp.take_along_axis(ts.avail, a[:, None], axis=1)))
