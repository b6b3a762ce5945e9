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
from functools import partial
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
from cleanmarl_tpu.core.rewards import standardize
from cleanmarl_tpu.core.schedules import linear_schedule
from cleanmarl_tpu.envs import registry
from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.envs.external import as_vec
from cleanmarl_tpu.ops.returns import lambda_returns, nstep_returns


@dataclass
class COMAConfig:
    env_type: str = "matrix"
    env_name: str = ""
    env_family: str = "mpe"
    agent_ids: bool = True
    num_envs: int = 16
    rollout_len: int = 0              # 0 → episode_limit
    recurrent: bool = False           # GRU actor (coma_lstm.py)
    per_agent_rewards: bool = False   # un-aggregated env rewards (coma_lbf.py:255)
    bootstrap_truncation: bool = False  # r + γQ'(s_T, a~π_ε) at time-limit
    # truncation instead of a zero tail (coma_lbf.py:4, 557-578); FF actor only
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
    use_tdlambda: bool = True         # False → n-step targets (coma.py:62-64)
    nsteps: int = 1                   # n-step horizon when use_tdlambda=False
    # (coma.py:497-528; nsteps=1 is the λ=0 point of the TD(λ) recursion)
    entropy_coef: float = 0.001
    anneal_entropy: bool = False      # linear entropy-coef decay to 0 over
    # the run (matches the PPO family's knob; not in the reference)
    critic_epochs: int = 1            # critic gradient steps per rollout
    # before the actor update — re-fits the TD(λ) critic to the fresh
    # targets; a COMA-LBF stabilizer probe (reference fits once,
    # coma.py:469-496)
    anneal_lr: bool = False           # linear LR decay to 0 over the run
    # (an option the reference lacks; COMA's late-training policy decay
    # on LBF freezes out under it — validation/coma_lbf.jsonl)
    start_e: float = 0.5
    end_e: float = 0.002
    exploration_fraction: float = 750.0  # in training updates
    target_network_update_freq: int = 1  # in training updates
    polyak: float = 0.005
    normalize_reward: bool = False    # standardize batch rewards (coma.py:50)
    normalize_advantage: bool = True  # reference default True (coma.py:52)
    normalize_return: bool = False    # standardize critic targets (coma.py:530-533)
    clip_gradients: float = -1.0
    log_interval: int = 8
    eval_steps: int = 50_000
    num_eval_ep: int = 10
    checkpoint_dir: str = ""
    checkpoint_every: int = 200_000   # env steps between saves
    resume: bool = False
    use_wnb: bool = False           # Weights & Biases logging (vdn.py:67-71)
    wnb_project: str = ""
    wnb_entity: str = ""
    profile_dir: str = ""           # jax.profiler trace of one train block
    use_mesh: bool = False          # shard the env batch over all devices
    coordinator_address: str = ""   # multi-host: jax.distributed coordinator
    num_processes: int = 1          # multi-host: total process count
    process_id: int = 0             # multi-host: this process's rank
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
    actor_h: chex.Array  # (num_envs, n_agents, H); zeros when FF
    stats: EpisodeStats
    step: chex.Array
    num_updates: chex.Array
    key: chex.PRNGKey


def make_train(cfg: COMAConfig, env=None):
    if env is None:
        env = registry.make(cfg.env_type, cfg.env_name, agent_ids=cfg.agent_ids,
                            env_family=cfg.env_family)
    vec = as_vec(env, cfg.num_envs)
    rollout_len = cfg.rollout_len or env.episode_limit
    total_updates = max(cfg.total_timesteps // (rollout_len * cfg.num_envs), 1)
    n_updates = total_updates if cfg.anneal_lr else 0
    actor_opt = make_optimizer(
        cfg.optimizer, cfg.learning_rate_actor, cfg.clip_gradients, n_updates
    )
    # the LR schedule counts OPTIMIZER steps: the critic takes
    # critic_epochs of them per rollout, so its anneal horizon scales
    # accordingly (else the critic LR would hit 0 at 1/k of the run)
    critic_opt = make_optimizer(
        cfg.optimizer, cfg.learning_rate_critic, cfg.clip_gradients,
        n_updates * max(1, cfg.critic_epochs),
    )
    n, A = env.n_agents, env.n_actions
    critic_in = env.state_dim + env.obs_dim + (n - 1) * A
    lam = cfg.td_lambda if cfg.use_tdlambda else 0.0

    if cfg.bootstrap_truncation and cfg.recurrent:
        # coma_lbf is feed-forward; the terminal-obs actor pass below has
        # no hidden stream to resume for a GRU actor
        raise ValueError(
            "--bootstrap_truncation requires a feed-forward actor "
            "(--recurrent false): the truncation bootstrap re-runs the "
            "actor on the terminal observation, which has no GRU hidden "
            "stream to resume (reference coma_lbf.py is feed-forward)"
        )
    if cfg.per_agent_rewards:
        # fail at build time with an actionable message instead of an
        # opaque KeyError at trace time (VERDICT r1 weak-5)
        ts_probe = jax.eval_shape(env.reset, jax.random.PRNGKey(0))[1]
        if "agent_rewards" not in ts_probe.info:
            raise ValueError(
                "--per_agent_rewards needs an env that reports per-agent "
                "rewards in info['agent_rewards'] (LBF with "
                f"reward_aggr='none', envs/lbf.py); env "
                f"{cfg.env_type}:{cfg.env_name or '<default>'} does not"
            )
    idx = jnp.arange(n)
    others = jax.vmap(lambda i: jnp.delete(idx, i, assume_unique_indices=True))(idx)
    H = cfg.actor_hidden_dim

    def _eps_mix(logits, avail, epsilon):
        probs = jax.nn.softmax(logits, axis=-1)
        availf = avail.astype(jnp.float32)
        uni = availf / jnp.maximum(availf.sum(-1, keepdims=True), 1.0)
        return (1.0 - epsilon) * probs + epsilon * uni

    def actor_step(params, h, obs, avail, epsilon):
        """→ (h', probs). h is ignored/passed-through for the FF actor."""
        if cfg.recurrent:
            h2, logits = nets.rnn_apply(params, h, obs)
        else:
            h2, logits = h, nets.mlp_apply(params, obs)
        return h2, _eps_mix(nets.masked_q(logits, avail), avail, epsilon)

    def actor_probs(params, obs, avail, epsilon):
        """FF probability helper (bootstrap value at the rollout cut)."""
        _, probs = actor_step(
            params, jnp.zeros(obs.shape[:-1] + (H,)), obs, avail, epsilon
        )
        return probs

    def actor_probs_seq(params, h0, obs_seq, avail_seq, ended_seq, epsilon):
        """Probs over a (T, B, n, ·) stream with GRU carry resets at
        episode boundaries (identity carry for FF)."""
        if not cfg.recurrent:
            return actor_probs(params, obs_seq, avail_seq, epsilon)
        # input projection + head hoisted out of the scan (rnn_seq_apply)
        _, logits = nets.rnn_seq_apply(params, h0, obs_seq, reset_seq=ended_seq)
        return _eps_mix(nets.masked_q(logits, avail_seq), avail_seq, epsilon)

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
        if cfg.recurrent:
            actor_params = nets.rnn_init(ka, env.obs_dim, H, A, final_gain=0.01)
        else:
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
            actor_h=jnp.zeros((cfg.num_envs, n, H)),
            stats=EpisodeStats.create(cfg.num_envs),
            step=jnp.zeros((), jnp.int32),
            num_updates=jnp.zeros(()),
            key=key,
        )

    def collect_rollout(runner: COMARunnerState, epsilon):
        def step_fn(carry, _):
            env_state, obs, state, avail, h, stats, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            h2, probs = actor_step(runner.actor_params, h, obs, avail, epsilon)
            actions = jax.random.categorical(
                k_act, jnp.log(probs + 1e-10)
            ).astype(jnp.int32)
            env_state, ts2, final = vec.step(env_state, actions, k_step)
            ended = jnp.logical_or(ts2.done, ts2.truncated)
            h2 = jnp.where(ended[:, None, None], 0.0, h2)
            stats = stats.step(
                ts2.reward, ended,
                ts2.info.get("battle_won", jnp.zeros_like(ts2.reward)),
            )
            if cfg.per_agent_rewards:
                reward = ts2.info["agent_rewards"]          # (E, n)
            else:
                reward = jnp.broadcast_to(ts2.reward[:, None], (cfg.num_envs, n))
            out = {
                "obs": obs, "state": state, "avail": avail,
                "action": actions, "reward": reward, "ended": ended,
            }
            if cfg.bootstrap_truncation:
                # terminal (pre-reset) timestep for the r + γQ'(s_T) patch
                out["trunc_only"] = jnp.logical_and(ts2.truncated, ~ts2.done)
                out["final_obs"] = final.obs
                out["final_state"] = final.state
                out["final_avail"] = final.avail.astype(jnp.bool_)
            return (env_state, ts2.obs, ts2.state, ts2.avail, h2, stats, key), out

        key, scan_key = jax.random.split(runner.key)
        h0 = runner.actor_h
        carry0 = (runner.env_state, runner.obs, runner.state, runner.avail,
                  h0, runner.stats, scan_key)
        carry, traj = jax.lax.scan(step_fn, carry0, None, length=rollout_len)
        env_state, obs, state, avail, h, stats, _ = carry
        runner = runner.replace(
            env_state=env_state, obs=obs, state=state, avail=avail,
            actor_h=h, stats=stats, key=key,
            step=runner.step + rollout_len * cfg.num_envs,
        )
        return runner, traj, h0

    def update(runner: COMARunnerState, traj, h0, epsilon):
        # ---- TD(λ) targets from the target critic --------------------
        q_tgt = critic_q(
            runner.target_critic, traj["state"], traj["obs"], traj["action"]
        )                                                        # (T,B,n,A)
        q_taken_tgt = jnp.take_along_axis(
            q_tgt, traj["action"][..., None], axis=-1
        )[..., 0]                                                # (T,B,n)
        # expected-SARSA bootstrap at the rollout cut (live hidden state)
        _, pi_boot = actor_step(
            runner.actor_params, runner.actor_h, runner.obs, runner.avail, 0.0
        )
        # the cut-state critic needs SOME joint action for "others"; use
        # the policy argmax (only reached when the episode didn't end)
        a_boot = jnp.argmax(pi_boot, axis=-1).astype(jnp.int32)
        q_boot = critic_q(runner.target_critic, runner.state, runner.obs, a_boot)
        v_boot = jnp.sum(pi_boot * q_boot, axis=-1)              # (B,n)
        reward = traj["reward"]                                  # (T,B,n)
        if cfg.normalize_reward:
            reward = standardize(reward)                         # coma.py:149-152
        if cfg.bootstrap_truncation:
            # G at a time-limit cut = r + γ·Q'(s_T, a~π_ε) instead of r
            # (coma_lbf.py:557-578); folding the bootstrap into the
            # reward at ended steps is the same recursion
            key, k_boot = jax.random.split(runner.key)
            runner = runner.replace(key=key)
            pi_last = actor_probs(
                runner.actor_params, traj["final_obs"], traj["final_avail"], epsilon
            )                                                    # (T,B,n,A)
            a_last = jax.random.categorical(
                k_boot, jnp.log(pi_last + 1e-10)
            ).astype(jnp.int32)
            q_last = critic_q(
                runner.target_critic, traj["final_state"], traj["final_obs"], a_last
            )
            q_last_taken = jnp.take_along_axis(
                q_last, a_last[..., None], axis=-1
            )[..., 0]                                            # (T,B,n)
            reward = reward + (
                cfg.gamma * q_last_taken
                * traj["trunc_only"][..., None].astype(reward.dtype)
            )
        ended = jnp.broadcast_to(traj["ended"][..., None], q_taken_tgt.shape)
        if cfg.use_tdlambda or cfg.nsteps <= 1:
            returns = lambda_returns(
                reward, ended, q_taken_tgt, v_boot, cfg.gamma, lam
            )
        else:
            # n-step critic targets (coma.py:497-528, use_tdlamda=False)
            returns = nstep_returns(
                reward, ended, q_taken_tgt, v_boot, cfg.gamma, cfg.nsteps
            )
        returns = jax.lax.stop_gradient(returns)
        if cfg.normalize_return:
            # agent-mean convention, critic targets only (coma.py:530-533)
            ret_am = returns.mean(axis=-1)
            returns = (returns - ret_am.mean()) / (ret_am.std() + 1e-8)

        # ---- critic ---------------------------------------------------
        def critic_loss_fn(p):
            q = critic_q(p, traj["state"], traj["obs"], traj["action"])
            q_taken = jnp.take_along_axis(q, traj["action"][..., None], axis=-1)[..., 0]
            return jnp.mean(jnp.square(q_taken - returns))

        def critic_step(carry, _):
            p, opt, _, _ = carry
            loss, grads = jax.value_and_grad(critic_loss_fn)(p)
            gnorm = nets.global_norm(grads)
            updates, opt = critic_opt.update(grads, opt, p)
            p = optax.apply_updates(p, updates)
            return (p, opt, loss, gnorm), None

        (critic_params, c_opt, c_loss, c_gnorm), _ = jax.lax.scan(
            critic_step,
            (runner.critic_params, runner.critic_opt,
             jnp.zeros(()), jnp.zeros(())),
            None, length=max(1, cfg.critic_epochs),
        )

        # ---- counterfactual actor update ------------------------------
        q_new = critic_q(critic_params, traj["state"], traj["obs"], traj["action"])
        q_new = jax.lax.stop_gradient(q_new)

        ent_coef = cfg.entropy_coef
        if cfg.anneal_entropy:
            ent_coef = cfg.entropy_coef * jnp.clip(
                1.0 - runner.num_updates / total_updates, 0.0, 1.0
            )

        def actor_loss_fn(p):
            pi = actor_probs_seq(
                p, h0, traj["obs"], traj["avail"], traj["ended"], 0.0
            )
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
            return -pg - ent_coef * ent, ent

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
        runner, traj, h0 = collect_rollout(runner, epsilon)
        runner, metrics = update(runner, traj, h0, epsilon)
        metrics["rollout/epsilon"] = epsilon
        return runner, metrics

    @partial(jax.jit, donate_argnums=0)
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
        carry, probs = actor_step(params, carry, obs, avail, 0.0)
        actions = jax.random.categorical(key, jnp.log(probs + 1e-10))
        return carry, actions.astype(jnp.int32)

    eval_fn = jax.jit(
        make_evaluator(
            env, cfg.num_eval_ep, sampled_policy,
            init_carry=lambda m: jnp.zeros((m, n, H)),
        )
    )
    meta = {"steps_per_block": rollout_len * cfg.num_envs * cfg.log_interval}
    return init, train_block, eval_fn, meta


def train(cfg: COMAConfig, env=None, logger: Logger | None = None):
    from cleanmarl_tpu.core.driver import run_training
    from cleanmarl_tpu.distributed.dp import DATA_FIELD_DIMS

    init, train_block, eval_fn, meta = make_train(cfg, env)
    return run_training(
        "COMA", cfg, init, train_block, eval_fn,
        steps_per_block=meta["steps_per_block"],
        eval_params=lambda r: r.actor_params,
        print_keys=("rollout/ep_reward", "train/critic_loss"),
        logger=logger,
        data_field_dims=DATA_FIELD_DIMS["COMA"],
    )


def main():
    from cleanmarl_tpu.core.cli import cli

    train(cli(COMAConfig, description=__doc__))


if __name__ == "__main__":
    main()
