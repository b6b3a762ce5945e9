"""Sequence-chunk replay: storage semantics (vdn_lstm.py:100-183 parity)
and the burn-in VDN-RNN learning path."""
import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.algos.recurrent_q import RecurrentQConfig, make_train
from cleanmarl_tpu.buffers.sequence import SequenceAccumulator, SequenceBuffer
from cleanmarl_tpu.envs.matrix_game import MatrixGame


def make_pair(num_envs=1, L=10, cap=64):
    example = {"x": jnp.zeros(())}
    ring = SequenceBuffer.create(cap, L, example)
    acc = SequenceAccumulator.create(num_envs, L, example)
    return ring, acc


def feed(ring, acc, values, ended_at):
    """Stream scalar records 1..N for one env; episode ends at indices
    in ended_at (0-based)."""
    for i, v in enumerate(values):
        rec = {"x": jnp.asarray([float(v)])}
        ended = jnp.asarray([i in ended_at])
        acc, ring = acc.add_step(ring, rec, ended)
    return ring, acc


def rows(ring):
    n = int(ring.size)
    return np.asarray(ring.data["x"])[:n]


def test_full_chunks_and_overlap_patch():
    # 25-step episode with L=10: chunks [1..10], [11..20], then the
    # is_last patch back-fills from the previous chunk → [16..25]
    ring, acc = make_pair()
    ring, acc = feed(ring, acc, range(1, 26), ended_at={24})
    got = rows(ring)
    assert got.shape == (3, 10)
    np.testing.assert_allclose(got[0], np.arange(1, 11))
    np.testing.assert_allclose(got[1], np.arange(11, 21))
    np.testing.assert_allclose(got[2], np.arange(16, 26))


def test_exact_boundary_episode_stores_no_patch():
    ring, acc = make_pair()
    ring, acc = feed(ring, acc, range(1, 21), ended_at={19})
    got = rows(ring)
    assert got.shape == (2, 10)
    np.testing.assert_allclose(got[1], np.arange(11, 21))
    assert int(acc.t[0]) == 0


def test_short_first_episode_backfills_zeros():
    # first episode shorter than L: back-fill source is the env's
    # (zero-initialized) previous chunk, like the reference's fresh
    # buffer rows (vdn_lstm.py:119-130)
    ring, acc = make_pair()
    ring, acc = feed(ring, acc, [1, 2, 3], ended_at={2})
    got = rows(ring)
    assert got.shape == (1, 10)
    np.testing.assert_allclose(got[0], [0, 0, 0, 0, 0, 0, 0, 1, 2, 3])


def test_next_episode_starts_fresh_after_patch():
    ring, acc = make_pair()
    ring, acc = feed(ring, acc, range(1, 26), ended_at={24})
    # second episode of 12 steps → one full chunk [100..109] + patch
    ring, acc = feed(ring, acc, range(100, 112), ended_at={11})
    got = rows(ring)
    assert got.shape == (5, 10)
    np.testing.assert_allclose(got[3], np.arange(100, 110))
    # patch back-fills from [100..109]: toadd=8 → tail [102..109] + [110, 111]
    np.testing.assert_allclose(
        got[4], list(range(102, 110)) + [110, 111]
    )


def test_multi_env_commits_land_in_distinct_rows():
    ring, acc = make_pair(num_envs=3, L=4)
    for i in range(4):  # all three envs fill their chunk simultaneously
        rec = {"x": jnp.asarray([10.0 + i, 20.0 + i, 30.0 + i])}
        acc, ring = acc.add_step(ring, rec, jnp.zeros((3,), jnp.bool_))
    got = rows(ring)
    assert got.shape == (3, 4)
    firsts = sorted(got[:, 0].tolist())
    assert firsts == [10.0, 20.0, 30.0]


def test_vdn_rnn_sequence_replay_learns_matrix_game():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = RecurrentQConfig(
        env_type="matrix", mixing="vdn", replay="sequence",
        seq_length=8, burn_in=4, num_envs=8, buffer_size=512,
        total_timesteps=40_000, train_freq=1, batch_size=16,
        learning_rate=3e-3, exploration_fraction=0.3, hidden_dim=32,
        polyak=0.05, log_interval=100, num_eval_ep=8, seed=0,
        # time-unaware MatrixGame obs: use the reference's infinite-
        # horizon truncation semantics (see test_vdn.py smoke_cfg)
        bootstrap_truncation=True,
    )
    init, train_block, eval_fn = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    for _ in range(cfg.total_timesteps // (cfg.num_envs * cfg.log_interval)):
        runner, metrics = train_block(runner)
    out = eval_fn(runner.params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 7.2, dict(out)
