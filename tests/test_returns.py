"""λ-return golden-parity tests vs a straightforward numpy reference
that mirrors the reference's per-episode reversed loop
(/root/reference/cleanmarl/ippo.py:394-411)."""
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.ops.returns import lambda_advantages, lambda_returns


def numpy_episode_lambda_returns(rewards, values, gamma, lam):
    """Reference semantics for ONE complete episode: next_value = 0 at
    the last step, V(o_{t+1}) otherwise."""
    T = len(rewards)
    g = np.zeros(T)
    last = 0.0
    for t in reversed(range(T)):
        next_value = 0.0 if t == T - 1 else values[t + 1]
        last = rewards[t] + gamma * (lam * last + (1 - lam) * next_value)
        g[t] = last
    return g


def test_single_complete_episode_matches_reference_loop():
    rng = np.random.RandomState(0)
    T = 7
    rewards = rng.randn(T)
    values = rng.randn(T)
    ended = np.zeros(T, bool)
    ended[-1] = True  # episode terminates at the last rollout step
    g = lambda_returns(
        jnp.asarray(rewards), jnp.asarray(ended), jnp.asarray(values),
        jnp.asarray(123.0),  # bootstrap must be irrelevant: episode ended
        gamma=0.97, lam=0.9,
    )
    expected = numpy_episode_lambda_returns(rewards, values, 0.97, 0.9)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)


def test_two_episodes_in_one_stream():
    """A stream holding two complete episodes (boundary mid-rollout) must
    equal per-episode computation on each half."""
    rng = np.random.RandomState(1)
    r1, r2 = rng.randn(4), rng.randn(3)
    v1, v2 = rng.randn(4), rng.randn(3)
    rewards = np.concatenate([r1, r2])
    values = np.concatenate([v1, v2])
    ended = np.zeros(7, bool)
    ended[3] = True
    ended[6] = True
    g = lambda_returns(
        jnp.asarray(rewards), jnp.asarray(ended), jnp.asarray(values),
        jnp.asarray(0.0), gamma=0.99, lam=0.95,
    )
    e1 = numpy_episode_lambda_returns(r1, v1, 0.99, 0.95)
    e2 = numpy_episode_lambda_returns(r2, v2, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(g), np.concatenate([e1, e2]), rtol=1e-5)


def test_midcut_bootstraps_with_value():
    """An unfinished episode at the rollout cut bootstraps from V(o_T):
    with λ=1 this is the discounted-sum-plus-tail identity."""
    rewards = np.array([1.0, 1.0, 1.0])
    values = np.zeros(3)
    ended = np.zeros(3, bool)
    vboot = 10.0
    g = lambda_returns(
        jnp.asarray(rewards), jnp.asarray(ended), jnp.asarray(values),
        jnp.asarray(vboot), gamma=0.5, lam=1.0,
    )
    # G2 = 1 + 0.5*10 = 6; G1 = 1 + 0.5*6 = 4; G0 = 1 + 0.5*4 = 3
    np.testing.assert_allclose(np.asarray(g), [3.0, 4.0, 6.0], rtol=1e-6)


def test_advantages_are_g_minus_v():
    rng = np.random.RandomState(2)
    rewards, values = rng.randn(5), rng.randn(5)
    ended = np.zeros(5, bool)
    g, a = lambda_advantages(
        jnp.asarray(rewards), jnp.asarray(ended), jnp.asarray(values),
        jnp.asarray(0.3), gamma=0.99, lam=0.95,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(g) - values, rtol=1e-6)


def test_batched_trailing_dims():
    rewards = jnp.ones((4, 2, 3))
    ended = jnp.zeros((4, 2, 3), bool)
    values = jnp.zeros((4, 2, 3))
    g = lambda_returns(rewards, ended, values, jnp.zeros((2, 3)), 0.9, 0.8)
    assert g.shape == (4, 2, 3)
