"""Fused Pallas GRU sequence kernel vs the XLA scan path: values and
gradients must agree (CPU interpret mode; compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleanmarl_tpu.core import networks as nets


@pytest.fixture
def setup():
    key = jax.random.PRNGKey(0)
    T, B, n, in_dim, H, A = 7, 4, 3, 11, 16, 5
    params = nets.rnn_init(key, in_dim, H, A)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, n, in_dim))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, n, H)) * 0.3
    reset = jax.random.bernoulli(jax.random.PRNGKey(3), 0.3, (T, B))
    return params, x, h0, reset


def test_pallas_matches_scan_forward(setup):
    params, x, h0, reset = setup
    hf_x, out_x = nets.rnn_seq_apply(params, h0, x, reset_seq=reset)
    hf_p, out_p = nets.rnn_seq_apply(params, h0, x, reset_seq=reset,
                                     impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf_p), np.asarray(hf_x),
                               atol=1e-5)


def test_pallas_matches_scan_forward_no_reset(setup):
    params, x, h0, _ = setup
    hf_x, out_x = nets.rnn_seq_apply(params, h0, x)
    hf_p, out_p = nets.rnn_seq_apply(params, h0, x, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf_p), np.asarray(hf_x),
                               atol=1e-5)


def test_pallas_gradients_match_scan(setup):
    params, x, h0, reset = setup

    def loss(impl):
        def f(params, h0, x):
            hf, out = nets.rnn_seq_apply(params, h0, x, reset_seq=reset,
                                         impl=impl)
            return jnp.sum(out * out) + jnp.sum(hf)
        return f

    val_x, grads_x = jax.value_and_grad(
        loss("xla"), argnums=(0, 1, 2)
    )(params, h0, x)
    val_p, grads_p = jax.value_and_grad(
        loss("pallas"), argnums=(0, 1, 2)
    )(params, h0, x)
    np.testing.assert_allclose(float(val_p), float(val_x), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads_p), jax.tree.leaves(grads_x)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4,
            err_msg="gradient mismatch between pallas and scan paths",
        )


def test_pallas_batch_padding_path():
    """Batch sizes not multiple of 8 go through the zero-pad path."""
    key = jax.random.PRNGKey(0)
    T, B, n, in_dim, H, A = 5, 1, 3, 9, 8, 4   # M = 3 → padded to 8
    params = nets.rnn_init(key, in_dim, H, A)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, n, in_dim))
    h0 = jnp.zeros((B, n, H))
    hf_x, out_x = nets.rnn_seq_apply(params, h0, x)
    hf_p, out_p = nets.rnn_seq_apply(params, h0, x, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(hf_p), np.asarray(hf_x),
                               atol=1e-5)


def test_pallas_rejects_tbptt():
    key = jax.random.PRNGKey(0)
    params = nets.rnn_init(key, 4, 8, 3)
    x = jnp.zeros((4, 8, 2, 4))
    h0 = jnp.zeros((8, 2, 8))
    with pytest.raises(ValueError):
        nets.rnn_seq_apply(params, h0, x, tbptt=2, impl="pallas")
