import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleanmarl_tpu.core import networks as nets


def test_mlp_shapes_and_depth():
    key = jax.random.PRNGKey(0)
    params = nets.mlp_init(key, 10, 32, 5, num_layers=2)
    # num_layers=2 → 3 hidden Linear+ReLU plus head (vdn.py:79-95 convention)
    assert len(params["layers"]) == 3
    out = nets.mlp_apply(params, jnp.ones((4, 7, 10)))
    assert out.shape == (4, 7, 5)


def test_orthogonal_init_is_orthogonal():
    key = jax.random.PRNGKey(1)
    w = nets.orthogonal(key, (64, 64), gain=1.0)
    np.testing.assert_allclose(w.T @ w, np.eye(64), atol=1e-4)


def test_masked_q_blocks_unavailable():
    q = jnp.array([[1.0, 5.0, 3.0]])
    avail = jnp.array([[True, False, True]])
    masked = nets.masked_q(q, avail)
    assert masked[0, 1] <= nets.MASK_NEG
    assert jnp.argmax(masked, axis=-1)[0] == 2


def test_gru_matches_torch_grucell():
    torch = pytest.importorskip("torch")
    torch.set_num_threads(1)  # avoid OpenMP/XLA threadpool clashes
    key = jax.random.PRNGKey(2)
    in_dim, hidden = 6, 8
    params = nets.gru_init(key, in_dim, hidden)
    x = np.random.RandomState(0).randn(3, in_dim).astype(np.float32)
    h = np.random.RandomState(1).randn(3, hidden).astype(np.float32)
    out = nets.gru_apply(params, jnp.asarray(h), jnp.asarray(x))

    cell = torch.nn.GRUCell(in_dim, hidden)
    with torch.no_grad():
        # fused (in, 3H) r|z|n layout transposes onto torch's stacked
        # (3H, in) weight_ih in the same gate order
        cell.weight_ih.copy_(torch.tensor(np.asarray(params["wi"]).T))
        cell.weight_hh.copy_(torch.tensor(np.asarray(params["wh"]).T))
        cell.bias_ih.zero_()
        cell.bias_hh.zero_()
        ref = cell(torch.tensor(x), torch.tensor(h)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_mixer_monotone_in_agent_qs():
    key = jax.random.PRNGKey(3)
    n_agents, state_dim = 3, 12
    params = nets.mixer_init(key, n_agents, state_dim, embed_dim=16, hyper_dim=32)
    state = jax.random.normal(jax.random.PRNGKey(4), (5, state_dim))
    qs = jax.random.normal(jax.random.PRNGKey(5), (5, n_agents))
    base = nets.mixer_apply(params, qs, state)
    bumped = nets.mixer_apply(params, qs + 0.5, state)
    assert jnp.all(bumped >= base)  # |W| ≥ 0 ⇒ monotone (qmix.py:110-123)


def test_soft_update_convex_combination():
    t = {"w": jnp.zeros((3,))}
    o = {"w": jnp.ones((3,))}
    out = nets.soft_update(t, o, 0.25)
    np.testing.assert_allclose(out["w"], 0.25 * np.ones(3))


def test_rnn_apply_shapes():
    key = jax.random.PRNGKey(6)
    params = nets.rnn_init(key, 9, 16, 4)
    h = nets.rnn_initial_state((2, 3), 16)
    h2, out = nets.rnn_apply(params, h, jnp.ones((2, 3, 9)))
    assert h2.shape == (2, 3, 16) and out.shape == (2, 3, 4)


def test_rnn_seq_apply_matches_per_step_scan():
    """The hoisted-input-projection sequence form (rnn_seq_apply) must be
    numerically equivalent — forward AND gradients — to scanning
    rnn_apply step by step with carry resets and TBPTT stop-gradients."""
    p = nets.rnn_init(jax.random.PRNGKey(0), 7, 16, 5)
    T, B, n = 11, 4, 3
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, n, 7))
    ended = jax.random.bernoulli(jax.random.PRNGKey(2), 0.2, (T, B))
    h0 = jax.random.normal(jax.random.PRNGKey(3), (B, n, 16)) * 0.1

    def per_step(pp, tbptt):
        def body(carry, inp):
            h, t = carry
            obs, e = inp
            if tbptt:
                h = jax.lax.cond(
                    jnp.mod(t, tbptt) == 0,
                    jax.lax.stop_gradient, lambda v: v, h,
                )
            h2, out = nets.rnn_apply(pp, h, obs)
            h_next = jnp.where(e[:, None, None], 0.0, h2)
            return (h_next, t + 1), out

        (hf, _), outs = jax.lax.scan(
            body, (h0, jnp.zeros((), jnp.int32)), (x, ended)
        )
        return hf, outs

    for tbptt in (0, 4):
        hf_ref, out_ref = per_step(p, tbptt)
        hf_new, out_new = nets.rnn_seq_apply(
            p, h0, x, reset_seq=ended, tbptt=tbptt
        )
        np.testing.assert_allclose(out_ref, out_new, atol=1e-5)
        np.testing.assert_allclose(hf_ref, hf_new, atol=1e-5)
        g_ref = jax.grad(lambda pp: (per_step(pp, tbptt)[1] ** 2).sum())(p)
        g_new = jax.grad(
            lambda pp: (nets.rnn_seq_apply(
                pp, h0, x, reset_seq=ended, tbptt=tbptt)[1] ** 2).sum()
        )(p)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=1e-3),
            g_ref, g_new,
        )

    # no-reset path used by the replay-time losses
    hf, out = nets.rnn_seq_apply(p, h0, x)
    assert out.shape == (T, B, n, 5) and hf.shape == (B, n, 16)


def test_reduced_matmul_dtype_close_to_f32():
    """compute_dtype plumbing: bf16-operand matmuls with f32 accumulation
    keep outputs f32 and within bf16 rounding of the f32 path."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cleanmarl_tpu.core import networks as nets

    key = jax.random.PRNGKey(0)
    params = nets.rnn_init(key, 12, 32, 5)
    x = jax.random.normal(jax.random.PRNGKey(1), (10, 4, 3, 12))
    h0 = jnp.zeros((4, 3, 32))
    _, out32 = nets.rnn_seq_apply(params, h0, x)
    _, out16 = nets.rnn_seq_apply(params, h0, x, dtype=jnp.bfloat16)
    assert out16.dtype == jnp.float32
    scale = float(jnp.abs(out32).max())
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), atol=0.05 * scale
    )

    mparams = nets.mlp_init(jax.random.PRNGKey(2), 12, 32, 5)
    y32 = nets.mlp_apply(mparams, x)
    y16 = nets.mlp_apply(mparams, x, dtype=jnp.bfloat16)
    assert y16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(y16), np.asarray(y32),
        atol=0.05 * float(jnp.abs(y32).max()),
    )
