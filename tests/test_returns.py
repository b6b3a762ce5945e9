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


def test_nstep_matches_hand_computed_3step():
    """coma.py:497-528 semantics: G_t = Σ_{i<n} γ^i r_{t+i} + γ^n V_{t+n},
    window truncating at episode end (no bootstrap inside the last n)."""
    from cleanmarl_tpu.ops.returns import nstep_returns

    gamma = 0.5
    rewards = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    values = np.array([10.0, 20.0, 30.0, 40.0, 50.0])
    ended = np.array([False, False, False, True, False])  # episode ends after t=3
    vboot = np.asarray(100.0)
    g = nstep_returns(
        jnp.asarray(rewards), jnp.asarray(ended), jnp.asarray(values),
        jnp.asarray(vboot), gamma=gamma, n=3,
    )
    # t=0: full window inside the episode → r0 + γr1 + γ²r2 + γ³V3
    exp0 = 1.0 + 0.5 * 2.0 + 0.25 * 3.0 + 0.125 * 40.0
    # t=1: episode ends at t=3 (within window) → r1 + γr2 + γ²r3, no bootstrap
    exp1 = 2.0 + 0.5 * 3.0 + 0.25 * 4.0
    # t=2: r2 + γr3 (end), no bootstrap
    exp2 = 3.0 + 0.5 * 4.0
    # t=3: ended → r3 alone
    exp3 = 4.0
    # t=4: new episode, window hits the rollout cut → r4 + γ·vboot
    exp4 = 5.0 + 0.5 * 100.0
    np.testing.assert_allclose(
        np.asarray(g), [exp0, exp1, exp2, exp3, exp4], rtol=1e-6
    )


def test_nstep1_equals_lambda0():
    from cleanmarl_tpu.ops.returns import nstep_returns

    rng = np.random.RandomState(0)
    rewards = jnp.asarray(rng.randn(6, 3))
    values = jnp.asarray(rng.randn(6, 3))
    ended = jnp.asarray(rng.rand(6, 3) < 0.3)
    vboot = jnp.asarray(rng.randn(3))
    g1 = nstep_returns(rewards, ended, values, vboot, gamma=0.9, n=1)
    g2 = lambda_returns(rewards, ended, values, vboot, gamma=0.9, lam=0.0,
                        use_pallas=False)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
