"""Committed env transcripts must replay bit-for-bit against the live
env code.

The transcripts (validation/transcripts/*.npz, recorded by
scripts/record_env_transcripts.py) serve two roles: the upstream-diff
input for scripts/diff_vs_upstream.py, and — here — a regression pin on
the pure-JAX env dynamics: any change to SMAClite/LBF stepping rules
that alters obs/state/reward/avail on these action scripts fails this
test, so dynamics changes are always deliberate and re-recorded.
"""
import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleanmarl_tpu.envs import registry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PATHS = sorted(glob.glob(os.path.join(REPO, "validation", "transcripts",
                                      "*.npz")))


@pytest.mark.parametrize("path", PATHS,
                         ids=[os.path.basename(p) for p in PATHS])
def test_transcript_replays_exactly(path):
    z = np.load(path)
    import json
    kwargs = json.loads(str(z["meta_env_kwargs"])) \
        if "meta_env_kwargs" in z.files else {}
    env = registry.make(str(z["meta_env_type"]), str(z["meta_env_name"]),
                        agent_ids=False, **kwargs)
    assert env.n_agents == int(z["meta_n_agents"])
    assert env.obs_dim == int(z["meta_obs_dim"])
    assert env.state_dim == int(z["meta_state_dim"])
    assert env.n_actions == int(z["meta_n_actions"])

    step_jit = jax.jit(env.step)
    reset_jit = jax.jit(env.reset)
    seed = int(z["meta_seed"])
    state = None
    ep_prev = -1
    for i in range(len(z["t"])):
        ep, t = int(z["ep"][i]), int(z["t"][i])
        if ep != ep_prev:
            state, ts = reset_jit(jax.random.PRNGKey(seed * 1000 + ep))
            ep_prev = ep
        state, ts = step_jit(
            state, jnp.asarray(z["action"][i]),
            jax.random.PRNGKey(seed * 100000 + ep * 1000 + t),
        )
        np.testing.assert_allclose(
            np.asarray(ts.obs), z["obs"][i], atol=1e-6,
            err_msg=f"{os.path.basename(path)} ep={ep} t={t} obs",
        )
        np.testing.assert_allclose(
            np.asarray(ts.state), z["state"][i], atol=1e-6,
            err_msg=f"{os.path.basename(path)} ep={ep} t={t} state",
        )
        np.testing.assert_array_equal(
            np.asarray(ts.avail).astype(bool), z["avail"][i],
            err_msg=f"{os.path.basename(path)} ep={ep} t={t} avail",
        )
        np.testing.assert_allclose(
            float(ts.reward), float(z["reward"][i]), atol=1e-6,
            err_msg=f"{os.path.basename(path)} ep={ep} t={t} reward",
        )
        assert bool(ts.done) == bool(z["done"][i])
        assert bool(ts.truncated) == bool(z["truncated"][i])
