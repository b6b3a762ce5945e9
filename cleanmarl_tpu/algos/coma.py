"""COMA — Counterfactual Multi-Agent policy gradients.

TPU-native rebuild of /root/reference/cleanmarl/coma.py
(+ coma_multienvs.py, coma_jax.py, coma_lbf.py):

- **Critic**: per-agent action-value head Q_i(·) over the input
  [state ‖ own obs ‖ one-hot actions of the OTHER agents]
  (coma.py:198-248 — the eye-mask reshape gymnastics become a vmapped
  delete-index gather here).
- **Targets**: TD(λ) against the TARGET critic's Q at the next taken
  action, G_t = r + γ(λ·G_{t+1} + (1−λ)·Q'_{t+1}[a_{t+1}]), zero at
  episode end (coma.py:469-496). On-policy rollout streams replace the
  exactly-batch_size-episodes collection; at a mid-episode rollout cut
  the tail bootstraps with the expected-SARSA value Σ_a π(a)·Q'(a)
  (the reference never cuts episodes; boundary steps are identical).
  The reference's n-step alternative (use_tdlamda=False, nsteps=1,
  coma.py:497-528) is the λ=0 point of the same recursion.
- **Advantage**: counterfactual baseline
  A_i = Q_i[a_i] − Σ_a π_i(a)·Q_i(a), detached (coma.py:570-583).
- **Actor**: ε-softmax behaviour policy
  (1−ε)·softmax(masked logits) + ε·uniform(avail) with ε scheduled
  over training UPDATES (0.5 → 0.002 over 750, coma.py:66-71,177-195);
  the gradient uses the pure softmax probs (reference trains with
  eps=0 logits, coma.py:535-541). Entropy bonus uses the reference's
  mean-over-actions convention (coma.py:538-540).
"""
from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any

import chex
import jax
import jax.numpy as jnp
import optax

from cleanmarl_tpu.core import networks as nets
from cleanmarl_tpu.core.evaluation import make_evaluator
from cleanmarl_tpu.core.logger import Logger
from cleanmarl_tpu.core.metrics import EpisodeStats
from cleanmarl_tpu.core.optim import make_optimizer
from cleanmarl_tpu.core.schedules import linear_schedule
from cleanmarl_tpu.envs import registry
from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.ops.returns import lambda_returns


@dataclass
class COMAConfig:
    env_type: str = "matrix"
    env_name: str = ""
    env_family: str = "mpe"
    agent_ids: bool = True
    num_envs: int = 16
    rollout_len: int = 0              # 0 → episode_limit
    actor_hidden_dim: int = 64
    actor_num_layers: int = 1
    critic_hidden_dim: int = 64
    critic_num_layers: int = 1
    optimizer: str = "adam"
    learning_rate_actor: float = 5e-4
    learning_rate_critic: float = 5e-4
    total_timesteps: int = 1_000_000
    gamma: float = 0.99
    td_lambda: float = 0.8
    use_tdlambda: bool = True         # False → λ=0 (1-step targets)
    entropy_coef: float = 0.001
    start_e: float = 0.5
    end_e: float = 0.002
    exploration_fraction: float = 750.0  # in training updates
    target_network_update_freq: int = 1  # in training updates
    polyak: float = 0.005
    normalize_advantage: bool = False
    clip_gradients: float = -1.0
    log_interval: int = 8
    eval_steps: int = 50_000
    num_eval_ep: int = 10
    seed: int = 1
    verbose: bool = True


@chex.dataclass(frozen=True)
class COMARunnerState:
    actor_params: Any
    critic_params: Any
    target_critic: Any
    actor_opt: Any
    critic_opt: Any
    env_state: Any
    obs: chex.Array
    state: chex.Array
    avail: chex.Array
    stats: EpisodeStats
    step: chex.Array
    num_updates: chex.Array
    key: chex.PRNGKey


def make_train(cfg: COMAConfig, env=None):
    if env is None:
        env = registry.make(cfg.env_type, cfg.env_name, agent_ids=cfg.agent_ids)
    vec = VecEnv(env, cfg.num_envs)
    rollout_len = cfg.rollout_len or env.episode_limit
    actor_opt = make_optimizer(cfg.optimizer, cfg.learning_rate_actor, cfg.clip_gradients)
    critic_opt = make_optimizer(cfg.optimizer, cfg.learning_rate_critic, cfg.clip_gradients)
    n, A = env.n_agents, env.n_actions
    critic_in = env.state_dim + env.obs_dim + (n - 1) * A
    lam = cfg.td_lambda if cfg.use_tdlambda else 0.0

    idx = jnp.arange(n)
    others = jax.vmap(lambda i: jnp.delete(idx, i, assume_unique_indices=True))(idx)

    def actor_probs(params, obs, avail, epsilon):
        logits = nets.masked_q(nets.mlp_apply(params, obs), avail)
        probs = jax.nn.softmax(logits, axis=-1)
        availf = avail.astype(jnp.float32)
        uni = availf / jnp.maximum(availf.sum(-1, keepdims=True), 1.0)
        return (1.0 - epsilon) * probs + epsilon * uni

    def critic_q(params, state, obs, actions):
        """state (...,S), obs (...,n,O), actions (...,n) int →
        Q (..., n, A): per-agent action-values given the others' taken
        actions (coma_inputs, coma.py:228-248)."""
        onehot = jax.nn.one_hot(actions, A)                       # (...,n,A)
        other_oh = onehot[..., others, :]                         # (...,n,n-1,A)
        other_flat = other_oh.reshape(other_oh.shape[:-2] + ((n - 1) * A,))
        state_b = jnp.broadcast_to(
            state[..., None, :], state.shape[:-1] + (n, state.shape[-1])
        )
        x = jnp.concatenate([state_b, obs, other_flat], axis=-1)
        return nets.mlp_apply(params, x)

    def init(key: chex.PRNGKey) -> COMARunnerState:
        ka, kc, kreset, key = jax.random.split(key, 4)
        actor_params = nets.mlp_init(
            ka, env.obs_dim, cfg.actor_hidden_dim, A,
            cfg.actor_num_layers, final_gain=0.01,
        )
        critic_params = nets.mlp_init(
            kc, critic_in, cfg.critic_hidden_dim, A, cfg.critic_num_layers
        )
        env_state, ts = vec.reset(kreset)
        return COMARunnerState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_critic=jax.tree.map(jnp.copy, critic_params),
            actor_opt=actor_opt.init(actor_params),
            critic_opt=critic_opt.init(critic_params),
            env_state=env_state,
            obs=ts.obs, state=ts.state, avail=ts.avail,
            stats=EpisodeStats.create(cfg.num_envs),
            step=jnp.zeros((), jnp.int32),
            num_updates=jnp.zeros(()),
            key=key,
        )

    def collect_rollout(runner: COMARunnerState, epsilon):
        def step_fn(carry, _):
            env_state, obs, state, avail, stats, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            probs = actor_probs(runner.actor_params, obs, avail, epsilon)
            keys = jax.random.split(k_act, cfg.num_envs * n).reshape(cfg.num_envs, n, 2)
            actions = jax.vmap(jax.vmap(
                lambda k, p: jax.random.categorical(k, jnp.log(p + 1e-10))
            ))(keys, probs).astype(jnp.int32)
            env_state, ts2, final = vec.step(env_state, actions, k_step)
            ended = jnp.logical_or(ts2.done, ts2.truncated)
            stats = stats.step(
                ts2.reward, ended,
                ts2.info.get("battle_won", jnp.zeros_like(ts2.reward)),
            )
            out = {
                "obs": obs, "state": state, "avail": avail,
                "action": actions, "reward": ts2.reward, "ended": ended,
            }
            return (env_state, ts2.obs, ts2.state, ts2.avail, stats, key), out

        key, scan_key = jax.random.split(runner.key)
        carry0 = (runner.env_state, runner.obs, runner.state, runner.avail,
                  runner.stats, scan_key)
        carry, traj = jax.lax.scan(step_fn, carry0, None, length=rollout_len)
        env_state, obs, state, avail, stats, _ = carry
        runner = runner.replace(
            env_state=env_state, obs=obs, state=state, avail=avail,
            stats=stats, key=key,
            step=runner.step + rollout_len * cfg.num_envs,
        )
        return runner, traj

    def update(runner: COMARunnerState, traj, epsilon):
        # ---- TD(λ) targets from the target critic --------------------
        q_tgt = critic_q(
            runner.target_critic, traj["state"], traj["obs"], traj["action"]
        )                                                        # (T,B,n,A)
        q_taken_tgt = jnp.take_along_axis(
            q_tgt, traj["action"][..., None], axis=-1
        )[..., 0]                                                # (T,B,n)
        # expected-SARSA bootstrap at the rollout cut
        pi_boot = actor_probs(runner.actor_params, runner.obs, runner.avail, 0.0)
        # the cut-state critic needs SOME joint action for "others"; use
        # the policy argmax (only reached when the episode didn't end)
        a_boot = jnp.argmax(pi_boot, axis=-1).astype(jnp.int32)
        q_boot = critic_q(runner.target_critic, runner.state, runner.obs, a_boot)
        v_boot = jnp.sum(pi_boot * q_boot, axis=-1)              # (B,n)
        reward = jnp.broadcast_to(traj["reward"][..., None], q_taken_tgt.shape)
        ended = jnp.broadcast_to(traj["ended"][..., None], q_taken_tgt.shape)
        returns = lambda_returns(
            reward, ended, q_taken_tgt, v_boot, cfg.gamma, lam
        )
        returns = jax.lax.stop_gradient(returns)

        # ---- critic ---------------------------------------------------
        def critic_loss_fn(p):
            q = critic_q(p, traj["state"], traj["obs"], traj["action"])
            q_taken = jnp.take_along_axis(q, traj["action"][..., None], axis=-1)[..., 0]
            return jnp.mean(jnp.square(q_taken - returns))

        c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(runner.critic_params)
        c_gnorm = nets.global_norm(c_grads)
        c_updates, c_opt = critic_opt.update(
            c_grads, runner.critic_opt, runner.critic_params
        )
        critic_params = optax.apply_updates(runner.critic_params, c_updates)

        # ---- counterfactual actor update ------------------------------
        q_new = critic_q(critic_params, traj["state"], traj["obs"], traj["action"])
        q_new = jax.lax.stop_gradient(q_new)

        def actor_loss_fn(p):
            pi = actor_probs(p, traj["obs"], traj["avail"], 0.0)
            log_pi = jnp.log(pi + 1e-8)
            baseline = jnp.sum(pi * q_new, axis=-1)
            q_taken = jnp.take_along_axis(q_new, traj["action"][..., None], axis=-1)[..., 0]
            adv = jax.lax.stop_gradient(q_taken - baseline)
            if cfg.normalize_advantage:
                adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            logp_taken = jnp.take_along_axis(log_pi, traj["action"][..., None], axis=-1)[..., 0]
            entropy = -jnp.sum(pi * log_pi, axis=-1) / A  # ref's mean-over-A
            pg = jnp.mean(logp_taken * adv)
            ent = jnp.mean(entropy)
            return -pg - cfg.entropy_coef * ent, ent

        (a_loss, entropy), a_grads = jax.value_and_grad(
            actor_loss_fn, has_aux=True
        )(runner.actor_params)
        a_gnorm = nets.global_norm(a_grads)
        a_updates, a_opt = actor_opt.update(
            a_grads, runner.actor_opt, runner.actor_params
        )
        actor_params = optax.apply_updates(runner.actor_params, a_updates)

        num_updates = runner.num_updates + 1.0
        do_polyak = jnp.mod(num_updates, cfg.target_network_update_freq) == 0
        target_critic = jax.lax.cond(
            do_polyak,
            lambda: nets.soft_update(runner.target_critic, critic_params, cfg.polyak),
            lambda: runner.target_critic,
        )
        runner = runner.replace(
            actor_params=actor_params, critic_params=critic_params,
            target_critic=target_critic, actor_opt=a_opt, critic_opt=c_opt,
            num_updates=num_updates,
        )
        metrics = {
            "train/actor_loss": a_loss,
            "train/critic_loss": c_loss,
            "train/entropy": entropy,
            "train/actor_gradients": a_gnorm,
            "train/critic_gradients": c_gnorm,
        }
        return runner, metrics

    def rollout_and_update(runner: COMARunnerState, _):
        epsilon = linear_schedule(
            cfg.start_e, cfg.end_e, cfg.exploration_fraction, runner.num_updates
        )
        runner, traj = collect_rollout(runner, epsilon)
        runner, metrics = update(runner, traj, epsilon)
        metrics["rollout/epsilon"] = epsilon
        return runner, metrics

    @jax.jit
    def train_block(runner: COMARunnerState):
        runner, ms = jax.lax.scan(
            rollout_and_update, runner, None, length=cfg.log_interval
        )
        metrics = {
            **runner.stats.rollout_metrics(),
            **{k: v[-1] for k, v in ms.items()},
            "train/num_updates": runner.num_updates,
        }
        return runner.replace(stats=runner.stats.flush()), metrics

    def sampled_policy(params, carry, obs, avail, key):
        probs = actor_probs(params, obs, avail, 0.0)
        n_env = obs.shape[0]
        keys = jax.random.split(key, n_env * n).reshape(n_env, n, 2)
        actions = jax.vmap(jax.vmap(
            lambda k, p: jax.random.categorical(k, jnp.log(p + 1e-10))
        ))(keys, probs)
        return carry, actions.astype(jnp.int32)

    eval_fn = jax.jit(make_evaluator(env, cfg.num_eval_ep, sampled_policy))
    meta = {"steps_per_block": rollout_len * cfg.num_envs * cfg.log_interval}
    return init, train_block, eval_fn, meta


def train(cfg: COMAConfig, env=None, logger: Logger | None = None):
    init, train_block, eval_fn, meta = make_train(cfg, env)
    own_logger = logger is None
    if own_logger:
        logger = Logger("COMA", cfg)
    key = jax.random.PRNGKey(cfg.seed)
    init_key, eval_key = jax.random.split(key)
    runner = init(init_key)
    num_blocks = max(1, cfg.total_timesteps // meta["steps_per_block"])
    eval_every = max(1, cfg.eval_steps // meta["steps_per_block"])
    eval_metrics = {}
    t0 = time.time()
    for block in range(num_blocks):
        runner, metrics = train_block(runner)
        env_steps = int(runner.step)
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["perf/env_steps_per_s"] = env_steps / max(time.time() - t0, 1e-9)
        logger.log(metrics, env_steps)
        if cfg.verbose:
            print(
                f"[COMA] step={env_steps} "
                f"ep_reward={metrics['rollout/ep_reward']:.2f} "
                f"critic_loss={metrics['train/critic_loss']:.4f} "
                f"sps={metrics['perf/env_steps_per_s']:,.0f}",
                flush=True,
            )
        if (block + 1) % eval_every == 0:
            eval_key, k = jax.random.split(eval_key)
            eval_metrics = {
                k2: float(v)
                for k2, v in eval_fn(runner.actor_params, k).items()
            }
            logger.log(eval_metrics, env_steps)
    if own_logger:
        logger.close()
    return runner, eval_metrics


def main():
    from cleanmarl_tpu.core.cli import cli

    train(cli(COMAConfig, description=__doc__))


if __name__ == "__main__":
    main()
