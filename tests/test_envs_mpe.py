"""MPE port tests: physics invariants + hand-computed fixtures.

(The real pettingzoo-MPE is not installable here — pettingzoo 1.26.1
dropped the family — so fidelity is checked against the published MPE
core equations directly.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.envs import mpe
from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.envs.mpe import (
    DT,
    DAMPING,
    SENSITIVITY,
    SimpleSpread,
    SimpleSpeakerListener,
    action_force,
    collision_forces,
    integrate,
)


def test_action_force_mapping():
    # {0: noop, 1:+x, 2:−x, 3:+y, 4:−y} scaled by sensitivity
    f = np.asarray(action_force(jnp.arange(5)))
    np.testing.assert_allclose(
        f,
        np.array([[0, 0], [1, 0], [-1, 0], [0, 1], [0, -1]]) * SENSITIVITY,
    )


def test_integrator_matches_closed_form():
    pos = jnp.array([[0.0, 0.0]])
    vel = jnp.array([[1.0, 0.0]])
    force = jnp.array([[2.0, 0.0]])
    p2, v2 = integrate(pos, vel, force, jnp.array([True]))
    v_expected = 1.0 * (1 - DAMPING) + 2.0 * DT
    np.testing.assert_allclose(float(v2[0, 0]), v_expected, rtol=1e-6)
    np.testing.assert_allclose(float(p2[0, 0]), v_expected * DT, rtol=1e-6)


def test_collision_forces_repel_and_balance():
    pos = jnp.array([[0.0, 0.0], [0.2, 0.0]])  # overlapping (dist_min 0.3)
    sizes = jnp.array([0.15, 0.15])
    collide = jnp.array([True, True])
    f = np.asarray(collision_forces(pos, sizes, collide))
    assert f[0, 0] < 0 and f[1, 0] > 0          # push apart along x
    np.testing.assert_allclose(f[0], -f[1], atol=1e-6)  # Newton's third law
    # far apart → negligible force
    far = np.asarray(
        collision_forces(jnp.array([[0.0, 0.0], [2.0, 0.0]]), sizes, collide)
    )
    assert np.abs(far).max() < 1e-6


def test_spread_shapes_and_truncation():
    env = SimpleSpread()
    assert env.obs_dim == 18 and env.state_dim == 54
    key = jax.random.PRNGKey(0)
    s, ts = env.reset(key)
    assert ts.obs.shape == (3, 18)
    for t in range(25):
        s, ts = env.step(s, jnp.zeros((3,), jnp.int32), key)
    assert bool(ts.truncated) and not bool(ts.done)


def test_spread_reward_hand_computed():
    env = SimpleSpread(local_ratio=0.5)
    key = jax.random.PRNGKey(0)
    s, _ = env.reset(key)
    # place agents exactly on landmarks, far apart → no collisions
    s = s.replace(
        agent_pos=jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
        landmark_pos=jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
        agent_vel=jnp.zeros((3, 2)),
    )
    s2, ts = env.step(s, jnp.zeros((3,), jnp.int32), key)
    # noop from rest: agents stay on landmarks → min dists 0, no collisions
    np.testing.assert_allclose(float(ts.reward), 0.0, atol=1e-5)


def test_spread_collision_penalty_in_team_reward():
    env = SimpleSpread(local_ratio=1.0)  # isolate the local term
    key = jax.random.PRNGKey(0)
    s, _ = env.reset(key)
    # rewards are computed AFTER the physics step (as in MPE), so set up
    # two agents flying toward each other that end the step overlapped
    s = s.replace(
        agent_pos=jnp.array([[0.0, 0.0], [0.32, 0.0], [5.0, 5.0]]),
        agent_vel=jnp.array([[0.5, 0.0], [-0.5, 0.0], [0.0, 0.0]]),
    )
    s2, ts = env.step(s, jnp.zeros((3,), jnp.int32), key)
    dist = float(jnp.linalg.norm(s2.agent_pos[0] - s2.agent_pos[1]))
    assert dist < 0.3  # they really do overlap post-step
    assert float(ts.reward) <= -0.99  # agent0's −1 collision penalty


def test_spread_obs_layout():
    env = SimpleSpread()
    key = jax.random.PRNGKey(0)
    s, _ = env.reset(key)
    s = s.replace(
        agent_pos=jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
        agent_vel=jnp.array([[0.5, 0.0], [0.0, 0.0], [0.0, 0.0]]),
        landmark_pos=jnp.array([[0.2, 0.2], [0.4, 0.4], [0.6, 0.6]]),
    )
    obs = env._obs(s)
    np.testing.assert_allclose(np.asarray(obs[0, :2]), [0.5, 0.0])   # vel
    np.testing.assert_allclose(np.asarray(obs[0, 2:4]), [0.0, 0.0])  # pos
    np.testing.assert_allclose(np.asarray(obs[0, 4:6]), [0.2, 0.2])  # lm0 rel
    np.testing.assert_allclose(np.asarray(obs[0, 10:12]), [1.0, 0.0])  # other0 rel
    np.testing.assert_allclose(np.asarray(obs[0, 14:]), 0.0)         # comm zeros


def test_speaker_listener_contract():
    env = SimpleSpeakerListener()
    assert env.obs_dim == 11 and env.n_actions == 5
    key = jax.random.PRNGKey(0)
    s, ts = env.reset(key)
    # speaker can only use actions 0-2
    np.testing.assert_array_equal(
        np.asarray(ts.avail), [[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]]
    )
    # speaker obs: goal one-hot ×0.75 then zero padding
    g = int(s.goal)
    assert float(ts.obs[0, g]) == 0.75
    np.testing.assert_allclose(np.asarray(ts.obs[0, 3:]), 0.0)
    # communication reaches listener on the NEXT step
    s2, ts2 = env.step(s, jnp.array([1, 0]), key)
    np.testing.assert_allclose(np.asarray(ts2.obs[1, 8:]), [0.0, 1.0, 0.0])


def test_speaker_listener_reward_is_neg_sq_dist():
    env = SimpleSpeakerListener()
    key = jax.random.PRNGKey(0)
    s, _ = env.reset(key)
    s = s.replace(
        agent_pos=jnp.array([[0.0, 0.0], [0.3, 0.4]]),
        agent_vel=jnp.zeros((2, 2)),
        landmark_pos=jnp.array([[0.3, 0.4], [5.0, 5.0], [-5.0, -5.0]]),
        goal=jnp.zeros((), jnp.int32),
    )
    s2, ts = env.step(s, jnp.array([0, 0]), key)  # noop from rest
    np.testing.assert_allclose(float(ts.reward), 0.0, atol=1e-5)


def test_registry_and_vmap():
    env = mpe.make("simple_spread_v3")
    vec = VecEnv(env, 4)
    key = jax.random.PRNGKey(0)
    state, ts = vec.reset(key)
    assert ts.obs.shape == (4, 3, 18)
    state, ts, final = vec.step(state, jnp.zeros((4, 3), jnp.int32), key)
    assert ts.reward.shape == (4,)


def test_vdn_trains_on_spread_smoke():
    """Integration: a few jitted VDN blocks on simple_spread run and
    produce finite metrics (full learning is benchmarked, not unit-tested)."""
    from cleanmarl_tpu.algos.vdn import VDNConfig, make_train

    cfg = VDNConfig(
        env_type="mpe", env_name="simple_spread_v3", agent_ids=True,
        num_envs=4, buffer_size=1024, total_timesteps=2000,
        learning_starts=100, train_freq=1, batch_size=8,
        log_interval=50, num_eval_ep=4, seed=0,
    )
    init, train_block, eval_fn = make_train(cfg)
    runner = init(jax.random.PRNGKey(0))
    runner, metrics = train_block(runner)
    runner, metrics = train_block(runner)
    assert np.isfinite(float(metrics["train/loss"]))
    assert np.isfinite(float(metrics["rollout/ep_reward"]))
    assert float(metrics["rollout/ep_length"]) == 25.0


def test_reference_contract_and_action_decode():
    """simple_reference_v3: Discrete(50) decodes move = a % 5,
    say = a // 5 (pettingzoo simple_env._execute_world_step); the
    utterance lands on the OTHER agent's next-step obs tail."""
    env = mpe.make("simple_reference_v3")
    assert env.n_actions == 50 and env.obs_dim == 21
    key = jax.random.PRNGKey(0)
    s, ts = env.reset(key)
    assert ts.obs.shape == (2, 21)
    # agent 0 says symbol 7 while standing still (a = 0 + 5*7);
    # agent 1 moves +x silently (a = 1)
    s2, ts2 = env.step(s, jnp.array([35, 1], jnp.int32), key)
    np.testing.assert_array_equal(
        np.asarray(ts2.obs[1, -10:]), np.eye(10)[7]
    )  # agent 1 hears 7
    np.testing.assert_array_equal(
        np.asarray(ts2.obs[0, -10:]), np.eye(10)[0]
    )  # agent 0 hears agent 1's comm component 1 % ... = say 0
    assert float(s2.agent_vel[1, 0]) > 0.0   # decoded move
    assert float(s2.agent_vel[0, 0]) == 0.0  # speaker stood still


def test_reference_goal_obs_and_reward():
    """Each agent observes the goal color of the landmark the OTHER
    agent must reach; team reward blends agent 0's local −dist²(agent 1,
    goal 0) with the mean over both locals at local_ratio 0.5."""
    env = mpe.make("simple_reference_v3")
    key = jax.random.PRNGKey(0)
    s, _ = env.reset(key)
    s = s.replace(
        agent_pos=jnp.array([[0.0, 0.0], [1.0, 0.0]]),
        agent_vel=jnp.zeros((2, 2)),
        landmark_pos=jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0]]),
        goal=jnp.array([0, 1]),  # agent1 must reach lm0; agent0 lm1
    )
    # goal colors in obs: agent 0 sees onehot(lm0)-coded color
    obs = np.asarray(env._obs(s))
    np.testing.assert_allclose(obs[0, 8:11], [0.75, 0.25, 0.25])
    np.testing.assert_allclose(obs[1, 8:11], [0.25, 0.75, 0.25])
    # both stop (action 0): positions decay-only, velocities zero, so
    # post-step positions equal the set positions
    s2, ts = env.step(s, jnp.array([0, 0], jnp.int32), key)
    # local0 = -d^2(agent1, lm0) = 0; local1 = -d^2(agent0, lm1) = -1
    expected = 0.5 * 0.0 + 0.5 * np.mean([0.0, -1.0])
    np.testing.assert_allclose(float(ts.reward), expected, rtol=1e-6)
