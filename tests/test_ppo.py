"""IPPO/MAPPO learning smoke tests + PPO invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleanmarl_tpu.algos.ippo import make_train as make_ippo
from cleanmarl_tpu.algos.mappo import make_train as make_mappo
from cleanmarl_tpu.algos.ppo_common import PPOConfig
from cleanmarl_tpu.envs.matrix_game import MatrixGame


def ppo_cfg(**kw):
    base = dict(
        env_type="matrix",
        num_envs=16,
        total_timesteps=60_000,
        learning_rate_actor=3e-3,
        learning_rate_critic=3e-3,
        entropy_coef=0.01,
        epochs=3,
        log_interval=4,
        num_eval_ep=8,
        seed=0,
    )
    base.update(kw)
    return PPOConfig(**base)


def run_to_convergence(make_train, cfg, env):
    init, train_block, eval_fn, meta = make_train(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    num_blocks = cfg.total_timesteps // meta["steps_per_block"]
    for _ in range(num_blocks):
        runner, metrics = train_block(runner)
    return runner, eval_fn, metrics


def test_ippo_learns_matrix_game():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = ppo_cfg()
    runner, eval_fn, metrics = run_to_convergence(make_ippo, cfg, env)
    out = eval_fn(runner.actor_params, jax.random.PRNGKey(1))
    # sampled policy with entropy bonus: demand ≥ 85% of optimum 8
    assert float(out["eval/ep_reward"]) > 6.8, dict(out)


def test_mappo_learns_matrix_game():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = ppo_cfg()
    runner, eval_fn, metrics = run_to_convergence(make_mappo, cfg, env)
    out = eval_fn(runner.actor_params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 6.8, dict(out)


def test_ppo_metrics_and_diagnostics():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = ppo_cfg(total_timesteps=2048)
    init, train_block, eval_fn, meta = make_ippo(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    runner, metrics = train_block(runner)
    for k in (
        "train/actor_loss", "train/critic_loss", "train/entropy",
        "train/kl_divergence", "train/clipped_ratios",
        "train/actor_gradients", "train/critic_gradients",
        "rollout/ep_reward",
    ):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # first epoch of first update: ratio == 1 ⇒ KL small, entropy near uniform
    assert float(metrics["train/entropy"]) > 0.5
    # actions respect avail masks: entropy can't exceed log(3)
    assert float(metrics["train/entropy"]) <= np.log(3) + 1e-3


def test_mappo_critic_sees_state_not_obs():
    """The centralized critic must have state_dim inputs."""
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = ppo_cfg(total_timesteps=2048)
    init, *_ = make_mappo(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    w = runner.critic_params["layers"][0]["w"]
    assert w.shape[0] == env.state_dim
    init_i, *_ = make_ippo(cfg, env)
    runner_i = init_i(jax.random.PRNGKey(0))
    wi = runner_i.critic_params["layers"][0]["w"]
    assert wi.shape[0] == env.obs_dim


def test_recurrent_mappo_learns_matrix_game():
    """North-star shape: GRU actor + centralized FF critic
    (mappo_lstm_multienvs.py)."""
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = ppo_cfg(recurrent=True, total_timesteps=80_000)
    runner, eval_fn, metrics = run_to_convergence(make_mappo, cfg, env)
    out = eval_fn(runner.actor_params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 6.8, dict(out)


def test_recurrent_hidden_state_carries_and_resets():
    """With rollout_len = episode_limit every episode ends at the block
    boundary, so the carried h must be zeros; with a mid-episode cut
    (rollout_len=5 vs limit 8) the carried h must be non-zero."""
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)

    cfg_aligned = ppo_cfg(recurrent=True, total_timesteps=2048)
    init, train_block, *_ = make_mappo(cfg_aligned, env)
    runner = init(jax.random.PRNGKey(0))
    runner, _ = train_block(runner)
    assert np.abs(np.asarray(runner.actor_h)).sum() == 0.0

    cfg_cut = ppo_cfg(recurrent=True, rollout_len=5, total_timesteps=2048,
                      log_interval=1)
    init, train_block, *_ = make_mappo(cfg_cut, env)
    runner = init(jax.random.PRNGKey(0))
    runner, _ = train_block(runner)
    assert np.abs(np.asarray(runner.actor_h)).sum() > 0.0


def test_tbptt_gradient_cut_runs():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = ppo_cfg(recurrent=True, tbptt=4, total_timesteps=2048)
    init, train_block, eval_fn, meta = make_ippo(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    runner, metrics = train_block(runner)
    assert np.isfinite(float(metrics["train/actor_loss"]))


def test_normalize_flags_run_and_learn():
    """normalize_reward / normalize_advantage / normalize_return
    (ippo.py:49-54 parity flags) keep the jitted block finite and the
    policy still learns the matrix game."""
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = ppo_cfg(normalize_reward=True, normalize_advantage=True,
                  normalize_return=True)
    runner, eval_fn, metrics = run_to_convergence(make_ippo, cfg, env)
    for v in metrics.values():
        assert np.isfinite(float(v)), metrics
    out = eval_fn(runner.actor_params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 6.0, dict(out)


def test_anneal_entropy_learns_and_sharpens():
    """anneal_entropy decays the entropy bonus to 0 over the run: the
    policy still learns, and ends sharper (lower entropy) than the
    constant-coef run from the same seed."""
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    _, _, m_const = run_to_convergence(make_ippo, ppo_cfg(), env)
    runner, eval_fn, m_anneal = run_to_convergence(
        make_ippo, ppo_cfg(anneal_entropy=True), env
    )
    out = eval_fn(runner.actor_params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 6.8, dict(out)
    assert float(m_anneal["train/entropy"]) < float(m_const["train/entropy"])


def test_phase_timer_reports_rollout_and_update():
    """SURVEY §5.1: per-phase diagnostic timing on the PPO path."""
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = PPOConfig(env_type="matrix", num_envs=4, total_timesteps=512,
                    log_interval=1, seed=0)
    init, train_block, eval_fn, meta = make_mappo(cfg, env)
    runner = init(jax.random.PRNGKey(0))
    phases = meta["phase_timer"](runner, iters=1)
    assert phases["perf/rollout_s"] > 0
    assert phases["perf/update_s"] > 0
    assert 0.0 < phases["perf/rollout_frac"] < 1.0


def test_alive_mask_semantics():
    from cleanmarl_tpu.algos.ppo_common import alive_mask
    avail = jnp.array([
        [True, False, False],   # no-op only → dead
        [False, True, False],   # single non-noop → alive
        [True, True, False],    # no-op + move → alive
        [True, True, True],     # everything → alive
    ])
    np.testing.assert_allclose(
        np.asarray(alive_mask(avail)), [0.0, 1.0, 1.0, 1.0]
    )


def test_death_masking_noop_when_all_alive():
    """MatrixGame keeps ≥2 actions available, so death_masking must not
    change the update (weighted means with all-ones weights)."""
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    outs = {}
    for dm in (False, True):
        cfg = ppo_cfg(total_timesteps=2048, death_masking=dm,
                      normalize_advantage=True)
        init, train_block, eval_fn, meta = make_ippo(cfg, env)
        runner = init(jax.random.PRNGKey(0))
        runner, _ = train_block(runner)
        outs[dm] = runner.actor_params
    for a, b in zip(jax.tree.leaves(outs[False]), jax.tree.leaves(outs[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_vnorm_update_matches_two_pass_stats():
    from cleanmarl_tpu.algos.ppo_common import vnorm_init, vnorm_update
    rng = np.random.RandomState(0)
    chunks = [rng.randn(50) * 3 + 7, rng.randn(80) - 2, rng.randn(30) * 0.5]
    vn = vnorm_init()
    for c in chunks:
        vn = vnorm_update(vn, jnp.asarray(c))
    cat = np.concatenate(chunks)
    np.testing.assert_allclose(float(vn["mean"]), cat.mean(), rtol=1e-5)
    np.testing.assert_allclose(float(vn["var"]), cat.var(), rtol=1e-4)


def test_normalize_values_learns_and_tracks_returns():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = ppo_cfg(normalize_values=True)
    runner, eval_fn, metrics = run_to_convergence(make_mappo, cfg, env)
    out = eval_fn(runner.actor_params, jax.random.PRNGKey(1))
    assert float(out["eval/ep_reward"]) > 6.8, dict(out)
    # the normalizer's running mean must have moved toward the true
    # positive return scale (optimum 8/episode, γ-discounted)
    assert float(metrics["train/value_norm_mean"]) > 1.0
    assert float(runner.vnorm["count"]) > 1e4


def test_normalize_values_excludes_normalize_return():
    env = MatrixGame(n_agents=2, n_actions=3, episode_limit=8)
    cfg = ppo_cfg(normalize_values=True, normalize_return=True)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_ippo(cfg, env)
