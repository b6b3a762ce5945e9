"""Data-parallel scaling tests on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleanmarl_tpu.algos.mappo import make_train as make_mappo
from cleanmarl_tpu.algos.ppo_common import PPOConfig
from cleanmarl_tpu.algos.vdn import VDNConfig, make_train as make_vdn
from cleanmarl_tpu.distributed import make_mesh, shard_runner
from cleanmarl_tpu.envs.matrix_game import MatrixGame


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_mappo_block_runs_sharded():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = PPOConfig(env_type="matrix", num_envs=16, total_timesteps=4096,
                    log_interval=2, seed=0)
    init, train_block, eval_fn, meta = make_mappo(cfg, env)
    # two independent runners: train_block donates its input, and
    # device_put may alias the source buffer on the origin device
    runner = init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    sharded = shard_runner(init(jax.random.PRNGKey(0)), mesh,
                           sharded_dims={cfg.num_envs})
    # env-batch leaves sharded over data, params replicated
    obs_sh = sharded.obs.sharding
    assert obs_sh.spec == jax.sharding.PartitionSpec("data")
    p_sh = jax.tree.leaves(sharded.actor_params)[0].sharding
    assert p_sh.spec in (jax.sharding.PartitionSpec(), jax.sharding.PartitionSpec(None))

    out, metrics = train_block(sharded)
    # outputs keep their shardings and match the unsharded computation
    ref, ref_metrics = train_block(runner)
    np.testing.assert_allclose(
        float(metrics["rollout/ep_reward"]),
        float(ref_metrics["rollout/ep_reward"]),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(out.actor_params)[0]),
        np.asarray(jax.tree.leaves(ref.actor_params)[0]),
        atol=2e-5,
    )


def test_vdn_block_runs_sharded_with_buffer():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = VDNConfig(env_type="matrix", num_envs=8, buffer_size=256,
                    total_timesteps=2048, learning_starts=64,
                    log_interval=20, seed=0)
    init, train_block, eval_fn = make_vdn(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    mesh = make_mesh()
    sharded = shard_runner(
        runner, mesh, sharded_dims={cfg.num_envs, cfg.buffer_size}
    )
    buf_sh = jax.tree.leaves(sharded.buffer.data)[0].sharding
    assert buf_sh.spec == jax.sharding.PartitionSpec("data")
    out, metrics = train_block(sharded)
    assert np.isfinite(float(metrics["train/loss"]))
    assert float(out.step) == 20
