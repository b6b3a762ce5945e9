"""Pure-JAX pursuit vs the REAL pettingzoo pursuit_v4 — mechanics
cross-validation.

Unlike SMAClite/LBF (wheels absent, ENVS_FIDELITY.md), the upstream
pursuit implementation IS installed in-image, so the port's dynamics are
diffed against executed upstream code, not published prose: both envs
are driven from identical injected positions with identical actions
(evaders frozen to remove upstream RNG) and must produce identical
observations and rewards.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("pettingzoo")

from cleanmarl_tpu.envs.pursuit import Pursuit, PursuitState, rectangle_map


def make_upstream(n_pursuers, n_evaders, **kw):
    from pettingzoo.sisl import pursuit_v4

    env = pursuit_v4.parallel_env(
        n_pursuers=n_pursuers, n_evaders=n_evaders, freeze_evaders=True, **kw
    )
    env.reset(seed=0)
    return env


def inject(env, ppos, epos):
    """Overwrite upstream agent positions after a reset."""
    base = env.unwrapped.env
    for i, (x, y) in enumerate(ppos):
        base.pursuer_layer.set_position(i, int(x), int(y))
    for i, (x, y) in enumerate(epos):
        base.evader_layer.set_position(i, int(x), int(y))
    base.model_state[1] = base.pursuer_layer.get_state_matrix()
    base.model_state[2] = base.evader_layer.get_state_matrix()
    return base


def ours_state(ppos, epos, n_evaders):
    return PursuitState(
        ppos=jnp.asarray(ppos, jnp.int32),
        epos=jnp.asarray(epos, jnp.int32),
        ealive=jnp.ones(n_evaders, bool),
        t=jnp.zeros((), jnp.int32),
    )


def step_both(ppos, epos, actions, n_pursuers, n_evaders):
    up = make_upstream(n_pursuers, n_evaders)
    inject(up, ppos, epos)
    acts = {a: int(actions[i]) for i, a in enumerate(up.agents)}
    obs_u, rew_u, term_u, trunc_u, _ = up.step(acts)
    ours = Pursuit(n_pursuers=n_pursuers, n_evaders=n_evaders,
                   freeze_evaders=True)
    s2, ts = jax.jit(ours.step)(
        ours_state(ppos, epos, n_evaders), jnp.asarray(actions, jnp.int32),
        jax.random.PRNGKey(0),
    )
    return up, obs_u, rew_u, s2, ts, ours


def test_building_map_matches_upstream():
    from pettingzoo.sisl.pursuit.utils import two_d_maps

    up = two_d_maps.rectangle_map(16, 16)
    ours = rectangle_map(16, 16)
    np.testing.assert_array_equal(ours, (up == -1).astype(np.float32))


def test_interface_dims_match_upstream():
    up = make_upstream(8, 30)
    space = up.observation_space(up.agents[0])
    ours = Pursuit()
    assert space.shape == (7, 7, 3)
    assert ours.obs_dim == 7 * 7 * 3
    assert ours.n_actions == up.action_space(up.agents[0]).n
    assert ours.n_agents == 8


def test_obs_and_tag_reward_match_upstream():
    # open-field scenario, no captures: pursuers adjacent to evaders tag
    ppos = [(1, 1), (2, 13), (14, 2), (13, 14)]
    epos = [(1, 2), (2, 12), (14, 3)]
    actions = [4, 4, 4, 4]  # all stay
    up, obs_u, rew_u, s2, ts, ours = step_both(ppos, epos, actions, 4, 3)
    for i, a in enumerate(up.agents):
        np.testing.assert_allclose(
            np.asarray(ts.obs[i]), obs_u[a].reshape(-1), atol=1e-6,
            err_msg=f"obs mismatch agent {i}",
        )
    np.testing.assert_allclose(
        float(ts.reward), float(rew_u[up.agents[0]]), atol=1e-6
    )
    assert not bool(ts.done)


def test_moves_block_on_building_and_bounds():
    # pursuer 0 at building edge moving into it; pursuer 1 at map edge
    # moving out; both must stay — verified against upstream positions
    ppos = [(4, 8), (0, 0)]
    epos = [(15, 15)]
    actions = [1, 0]  # 0: right into building x=5..11,y=4..12; 1: left oob
    up, obs_u, rew_u, s2, ts, ours = step_both(ppos, epos, actions, 2, 1)
    base = up.unwrapped.env
    for i in range(2):
        np.testing.assert_array_equal(
            np.asarray(s2.ppos[i]),
            np.asarray(base.pursuer_layer.get_position(i)),
        )
    np.testing.assert_array_equal(np.asarray(s2.ppos), np.asarray(ppos))


def test_surround_capture_and_catch_reward_match_upstream():
    # 4 pursuers fully surround an open-field evader → caught, 5.0 each
    ppos = [(7, 1), (9, 1), (8, 0), (8, 2)]
    epos = [(8, 1), (15, 15)]
    actions = [4, 4, 4, 4]
    up, obs_u, rew_u, s2, ts, ours = step_both(ppos, epos, actions, 4, 2)
    assert bool(s2.ealive[0]) is False
    assert bool(s2.ealive[1]) is True
    assert up.unwrapped.env.evader_layer.n_agents() == 1
    np.testing.assert_allclose(
        float(ts.reward), float(rew_u[up.agents[0]]), atol=1e-6
    )
    # reward must include the 5.0-per-surrounder share
    assert float(ts.reward) > 4.0


def test_border_capture_needs_fewer_pursuers():
    # evader at the x=0 border: need_to_surround = 3
    ppos = [(0, 7), (0, 9), (1, 8), (15, 15)]
    epos = [(0, 8), (15, 0)]
    actions = [4, 4, 4, 4]
    up, obs_u, rew_u, s2, ts, ours = step_both(ppos, epos, actions, 4, 2)
    assert bool(s2.ealive[0]) is False
    assert up.unwrapped.env.evader_layer.n_agents() == 1
    np.testing.assert_allclose(
        float(ts.reward), float(rew_u[up.agents[0]]), atol=1e-6
    )


def test_sequential_submove_tag_accumulation_matches_upstream():
    # AEC semantics: pursuer 0 moves first and its tag is re-counted on
    # every later sub-step; a simultaneous-move implementation would get
    # this wrong. Pursuer 0 steps INTO tag range; pursuer 1 steps OUT.
    ppos = [(3, 1), (13, 1)]
    epos = [(1, 1), (13, 2)]
    actions = [0, 1]  # 0 moves left (toward evader), 1 moves right (away)
    up, obs_u, rew_u, s2, ts, ours = step_both(ppos, epos, actions, 2, 2)
    np.testing.assert_allclose(
        float(ts.reward), float(rew_u[up.agents[0]]), atol=1e-6
    )


def test_multi_cycle_random_rollout_matches_upstream():
    """Drive BOTH envs for 12 cycles from the same injected start with
    the same pre-drawn action script (evaders frozen): obs and rewards
    must agree at every cycle."""
    rng = np.random.RandomState(3)
    n_p, n_e = 6, 5
    ppos = [(1, 1), (3, 1), (1, 14), (14, 1), (14, 14), (3, 14)]
    epos = [(2, 2), (2, 13), (13, 2), (13, 13), (0, 7)]
    up = make_upstream(n_p, n_e)
    inject(up, ppos, epos)
    ours = Pursuit(n_pursuers=n_p, n_evaders=n_e, freeze_evaders=True)
    s = ours_state(ppos, epos, n_e)
    step = jax.jit(ours.step)
    for cycle in range(12):
        actions = rng.randint(0, 5, n_p)
        acts = {a: int(actions[i]) for i, a in enumerate(up.agents)}
        obs_u, rew_u, term_u, trunc_u, _ = up.step(acts)
        s, ts = step(s, jnp.asarray(actions, jnp.int32),
                     jax.random.PRNGKey(cycle))
        if not up.agents:  # upstream ends when all evaders caught
            assert bool(ts.done)
            break
        np.testing.assert_allclose(
            float(ts.reward), float(rew_u[list(rew_u)[0]]), atol=1e-6,
            err_msg=f"reward mismatch at cycle {cycle}",
        )
        for i, a in enumerate(list(obs_u)):
            np.testing.assert_allclose(
                np.asarray(ts.obs[i]), obs_u[a].reshape(-1), atol=1e-6,
                err_msg=f"obs mismatch agent {i} cycle {cycle}",
            )
        # alive-evader count must track upstream removals
        assert int(jnp.sum(s.ealive)) == up.unwrapped.env.evader_layer.n_agents()


def test_spawn_rules():
    env = Pursuit()
    state, ts = jax.jit(env.reset)(jax.random.PRNGKey(0))
    bmap = np.asarray(rectangle_map(16, 16))
    for pos in np.asarray(state.ppos):
        assert bmap[pos[0], pos[1]] == 0.0
    for pos in np.asarray(state.epos):
        assert bmap[pos[0], pos[1]] == 0.0
    # same-group agents are never on/orthogonally-adjacent to each other
    for group in (np.asarray(state.ppos), np.asarray(state.epos)):
        for i in range(len(group)):
            for j in range(i + 1, len(group)):
                assert abs(group[i] - group[j]).sum() > 1


def test_truncation_and_termination():
    env = Pursuit(n_pursuers=2, n_evaders=1, time_limit=3,
                  freeze_evaders=True)
    # evader boxed at corner? just run to the time limit
    s, ts = env.reset(jax.random.PRNGKey(0))
    for _ in range(3):
        s, ts = env.step(s, jnp.asarray([4, 4], jnp.int32),
                         jax.random.PRNGKey(1))
    assert bool(ts.truncated) and not bool(ts.done)


def test_vdn_trains_on_pure_jax_pursuit():
    """End-to-end: the jitted VDN block runs on the vectorized pure-JAX
    pursuit at on-device speed (small config)."""
    from cleanmarl_tpu.algos.vdn import VDNConfig, make_train
    from cleanmarl_tpu.envs import registry

    env = registry.make("pursuit", "pursuit_v4", n_pursuers=4, n_evaders=6,
                        time_limit=40)
    cfg = VDNConfig(env_type="pursuit", num_envs=4, buffer_size=2048,
                    total_timesteps=1200, learning_starts=100, train_freq=2,
                    batch_size=4, hidden_dim=32, log_interval=50,
                    num_eval_ep=2, seed=0)
    init, train_block, eval_fn = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    runner, metrics = train_block(runner)
    assert np.isfinite(float(metrics["train/loss"]))
    assert int(runner.step) == 50


def test_spawn_exhaustion_guard():
    with pytest.raises(ValueError, match="open cells"):
        Pursuit(n_evaders=50)
