"""Checkpoint/resume roundtrip: restored runner continues bit-exactly."""
import tempfile

import jax
import numpy as np

from cleanmarl_tpu.algos.vdn import VDNConfig, make_train
from cleanmarl_tpu.core.checkpoint import Checkpointer
from cleanmarl_tpu.envs.matrix_game import MatrixGame


def test_checkpoint_roundtrip_and_exact_resume():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = VDNConfig(env_type="matrix", num_envs=4, buffer_size=256,
                    total_timesteps=2048, learning_starts=64,
                    log_interval=20, seed=0)
    init, train_block, eval_fn = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    runner, _ = train_block(runner)

    with tempfile.TemporaryDirectory() as d:
        ckpt = Checkpointer(d)
        ckpt.save(int(runner.step), runner, wait=True)
        assert ckpt.latest_step() == int(runner.step)

        template = init(jax.random.PRNGKey(42))  # different fresh state
        restored = ckpt.restore(template)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.params)[0]),
            np.asarray(jax.tree.leaves(runner.params)[0]),
        )
        # both continue identically
        a, ma = train_block(runner)
        b, mb = train_block(restored)
        np.testing.assert_allclose(
            float(ma["train/loss"]), float(mb["train/loss"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(a.params)[0]),
            np.asarray(jax.tree.leaves(b.params)[0]),
            atol=1e-6,
        )
        ckpt.close()
