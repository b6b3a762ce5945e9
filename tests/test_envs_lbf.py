"""LBF port behavioral tests."""
import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.envs import lbf
from cleanmarl_tpu.envs.lbf import EAST, LBF, LOAD, NORTH


def fixed_state(env, s, players, foods, levels, food_levels):
    return s.replace(
        player_pos=jnp.array(players, jnp.int32),
        player_level=jnp.array(levels, jnp.int32),
        food_pos=jnp.array(foods, jnp.int32),
        food_level=jnp.array(food_levels, jnp.int32),
        total_food=jnp.asarray(float(sum(food_levels))),
    )


def test_map_parsing():
    env = lbf.make("Foraging-8x8-2p-3f-v3")
    assert (env.grid_size, env.n_agents, env.n_foods, env.coop) == (8, 2, 3, False)
    assert env.obs_dim == 3 * 3 + 3 * 2
    env2 = lbf.make("Foraging-10x10-3p-4f-coop-v3")
    assert env2.coop
    try:
        lbf.make("Foraging-weird")
        assert False
    except ValueError:
        pass


def test_movement_bounds_and_food_block():
    env = LBF(grid_size=5, n_agents=2, n_foods=1)
    s, _ = env.reset(jax.random.PRNGKey(0))
    s = fixed_state(env, s, [[0, 0], [3, 3]], [[0, 1]], [1, 1], [2])
    k = jax.random.PRNGKey(1)
    # agent0 NORTH from row 0 → blocked (bounds); agent1 EAST → moves
    s2, ts = env.step(s, jnp.array([NORTH, EAST]), k)
    np.testing.assert_array_equal(np.asarray(s2.player_pos[0]), [0, 0])
    np.testing.assert_array_equal(np.asarray(s2.player_pos[1]), [3, 4])
    # agent0 EAST into the food cell → blocked
    s3, _ = env.step(s, jnp.array([EAST, NONE_ := 0]), k)
    np.testing.assert_array_equal(np.asarray(s3.player_pos[0]), [0, 0])


def test_move_conflict_both_stay():
    env = LBF(grid_size=5, n_agents=2, n_foods=1)
    s, _ = env.reset(jax.random.PRNGKey(0))
    s = fixed_state(env, s, [[2, 1], [2, 3]], [[4, 4]], [1, 1], [1])
    # both move into (2,2) → both stay
    s2, _ = env.step(s, jnp.array([EAST, 3]), jax.random.PRNGKey(1))  # 3=WEST
    np.testing.assert_array_equal(np.asarray(s2.player_pos), [[2, 1], [2, 3]])


def test_solo_load_success_and_reward():
    env = LBF(grid_size=5, n_agents=2, n_foods=2)
    s, _ = env.reset(jax.random.PRNGKey(0))
    # agent0 (level 2) adjacent to food0 (level 2); food1 level 2 far away
    s = fixed_state(env, s, [[1, 1], [4, 4]], [[1, 2], [0, 4]], [2, 1], [2, 2])
    s2, ts = env.step(s, jnp.array([LOAD, 0]), jax.random.PRNGKey(1))
    assert int(s2.food_level[0]) == 0
    # reward = food_level*level/loader_sum / total = 2*2/2 / 4 = 0.5
    np.testing.assert_allclose(float(ts.reward), 0.5, rtol=1e-6)
    assert not bool(ts.done)  # one food left


def test_under_leveled_load_fails_and_coop_succeeds():
    env = LBF(grid_size=5, n_agents=2, n_foods=1)
    s, _ = env.reset(jax.random.PRNGKey(0))
    # food level 3 between both agents; each alone (level 1+2) is too weak
    s = fixed_state(env, s, [[1, 1], [1, 3]], [[1, 2]], [1, 2], [3])
    solo, ts_solo = env.step(s, jnp.array([LOAD, 0]), jax.random.PRNGKey(1))
    assert int(solo.food_level[0]) == 3 and float(ts_solo.reward) == 0.0
    both, ts_both = env.step(s, jnp.array([LOAD, LOAD]), jax.random.PRNGKey(1))
    assert int(both.food_level[0]) == 0
    # shares: 3*1/3 + 3*2/3 = 3, normalized by total 3 → team sum = 1
    np.testing.assert_allclose(float(ts_both.reward), 1.0, rtol=1e-6)
    assert bool(ts_both.done)  # all food collected → terminal


def test_eaten_food_masked_in_obs():
    env = LBF(grid_size=5, n_agents=2, n_foods=1)
    s, _ = env.reset(jax.random.PRNGKey(0))
    s = fixed_state(env, s, [[1, 1], [1, 3]], [[1, 2]], [2, 2], [2])
    s2, ts = env.step(s, jnp.array([LOAD, 0]), jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(ts.obs[0, :3]), [-1.0, -1.0, 0.0])


def test_mean_reward_aggregation():
    env = LBF(grid_size=5, n_agents=2, n_foods=1, reward_aggr="mean")
    s, _ = env.reset(jax.random.PRNGKey(0))
    s = fixed_state(env, s, [[1, 1], [4, 4]], [[1, 2]], [2, 1], [2])
    s2, ts = env.step(s, jnp.array([LOAD, 0]), jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(ts.reward), 0.5, rtol=1e-6)  # mean of [1, 0]
