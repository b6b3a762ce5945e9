"""Compiled-TPU correctness check for the fused Pallas GRU kernel.

The CPU test suite exercises ops/pallas_gru.py in interpret mode
(tests/test_pallas_gru.py); this script runs the SAME value+gradient
equality checks against the XLA scan path compiled on the real chip,
at bench-like shapes. Run on the TPU queue after any kernel change.

Prints one JSON line; exit 0 iff forward and gradients agree.
"""
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cleanmarl_tpu.core import networks as nets


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    import sys
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T, B, n, in_dim, A = 60, 256, 3, 33, 9
    key = jax.random.PRNGKey(0)
    params = nets.rnn_init(key, in_dim, H, A)
    x = jax.random.normal(jax.random.PRNGKey(1), (T, B, n, in_dim))
    h0 = jax.random.normal(jax.random.PRNGKey(2), (B, n, H)) * 0.3
    reset = jax.random.bernoulli(jax.random.PRNGKey(3), 0.3, (T, B))

    def loss(impl):
        def f(params, h0, x):
            hf, out = nets.rnn_seq_apply(params, h0, x, reset_seq=reset,
                                         impl=impl)
            return jnp.sum(out * out) * 1e-3 + jnp.sum(hf)
        return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))

    vx, gx = loss("xla")(params, h0, x)
    vp, gp = loss("pallas")(params, h0, x)
    val_ok = bool(np.isclose(float(vp), float(vx), rtol=1e-4))
    max_rel = 0.0
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.maximum(np.abs(b).max(), 1e-6)
        max_rel = max(max_rel, float(np.abs(a - b).max() / denom))
    grad_ok = max_rel < 1e-3
    print(json.dumps({
        "ok": val_ok and grad_ok, "val_xla": float(vx),
        "val_pallas": float(vp), "grad_max_rel_err": max_rel,
    }))
    sys.exit(0 if (val_ok and grad_ok) else 1)


if __name__ == "__main__":
    main()
