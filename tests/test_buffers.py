import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.buffers.episode import EpisodeAccumulator, EpisodeBuffer
from cleanmarl_tpu.buffers.transition import TransitionBuffer


def test_transition_ring_wraparound():
    example = {"x": jnp.zeros((2,)), "r": jnp.zeros(())}
    buf = TransitionBuffer.create(5, example)
    for i in range(4):  # add 4 batches of 2 → 8 rows into capacity 5
        batch = {
            "x": jnp.full((2, 2), float(i)),
            "r": jnp.array([2.0 * i, 2.0 * i + 1]),
        }
        buf = buf.add_batch(batch)
    assert int(buf.size) == 5
    assert int(buf.cursor) == 3
    # rows written: r values 0..7 at ring positions (i mod 5)
    expected = np.zeros(5)
    for v in range(8):
        expected[v % 5] = v
    np.testing.assert_allclose(np.asarray(buf.data["r"]), expected)


def test_transition_sample_only_valid_rows():
    example = {"r": jnp.zeros(())}
    buf = TransitionBuffer.create(100, example)
    buf = buf.add_batch({"r": jnp.array([7.0, 7.0, 7.0])})
    out = buf.sample(jax.random.PRNGKey(0), 64)
    np.testing.assert_allclose(np.asarray(out["r"]), 7.0)


def test_episode_accumulator_commit_and_mask():
    num_envs, t_max, cap = 3, 4, 8
    example = {"r": jnp.zeros(())}
    ring = EpisodeBuffer.create(cap, t_max, example)
    acc = EpisodeAccumulator.create(num_envs, t_max, example)

    # env0 finishes after 2 steps, env1 after 3, env2 never (within 3 steps)
    ended_seq = [
        jnp.array([False, False, False]),
        jnp.array([True, False, False]),
        jnp.array([False, True, False]),
    ]
    for t, ended in enumerate(ended_seq):
        record = {"r": jnp.array([10.0 + t, 20.0 + t, 30.0 + t])}
        acc, ring = acc.add_step(ring, record, ended)

    assert int(ring.size) == 2
    batch, mask = ring.sample(jax.random.PRNGKey(1), 2)
    # lengths must be 2 and 3; scratch row (index cap) untouched by sample
    lengths = np.asarray(ring.length[:2])
    assert sorted(lengths.tolist()) == [2, 3]
    # committed env0 episode = rewards [10, 11]
    ep0 = np.asarray(ring.data["r"][0])
    np.testing.assert_allclose(ep0[:2], [10.0, 11.0])
    # env2 keeps accumulating (t=3)
    assert int(acc.t[2]) == 3
    # env0 reset to 0 after commit, then stepped once more at t=2? no:
    # env0 committed at step t=1, so after 3 steps its t is 1
    assert int(acc.t[0]) == 1


def test_episode_mask_shape_and_values():
    example = {"r": jnp.zeros(())}
    ring = EpisodeBuffer.create(4, 5, example)
    acc = EpisodeAccumulator.create(1, 5, example)
    for t in range(3):
        acc, ring = acc.add_step(
            ring, {"r": jnp.array([float(t)])}, jnp.array([t == 2])
        )
    batch, mask = ring.sample(jax.random.PRNGKey(0), 2)
    assert mask.shape == (2, 5)
    np.testing.assert_allclose(np.asarray(mask[0]), [1, 1, 1, 0, 0])
