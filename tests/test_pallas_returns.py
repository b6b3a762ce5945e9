"""Pallas λ-return kernel: numerical equality vs the lax.scan form
(interpreter mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.ops.pallas_returns import lambda_returns_pallas
from cleanmarl_tpu.ops.returns import lambda_returns


def test_pallas_matches_scan_small():
    rng = np.random.RandomState(0)
    T, B, n = 7, 5, 3
    rewards = jnp.asarray(rng.randn(T, B, n).astype(np.float32))
    ended = jnp.asarray(rng.rand(T, B, n) < 0.2)
    values = jnp.asarray(rng.randn(T, B, n).astype(np.float32))
    boot = jnp.asarray(rng.randn(B, n).astype(np.float32))
    ref = lambda_returns(rewards, ended, values, boot, 0.97, 0.9)
    out = lambda_returns_pallas(rewards, ended, values, boot, 0.97, 0.9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5)


def test_pallas_matches_scan_padded_batch():
    """Batch not a multiple of 128 exercises the lane padding path."""
    rng = np.random.RandomState(1)
    T, B = 25, 130
    rewards = jnp.asarray(rng.randn(T, B).astype(np.float32))
    ended = jnp.zeros((T, B), bool)
    values = jnp.asarray(rng.randn(T, B).astype(np.float32))
    boot = jnp.asarray(rng.randn(B).astype(np.float32))
    ref = lambda_returns(rewards, ended, values, boot, 0.99, 0.95)
    out = lambda_returns_pallas(rewards, ended, values, boot, 0.99, 0.95)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=1e-5)
