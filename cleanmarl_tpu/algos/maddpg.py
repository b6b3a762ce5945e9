"""MADDPG — Multi-Agent DDPG with discrete Gumbel-softmax actions.

TPU-native rebuild of /root/reference/cleanmarl/maddpg.py
(+ maddpg_multienvs.py, maddpg_jax.py):

- Behaviour actions are hard Gumbel-softmax samples of the avail-masked
  policy logits (maddpg.py:89-92; the Gumbel-max trick ≡ categorical
  sampling), stored as one-hot (maddpg.py:295-310).
- The centralized critic is Q(state ‖ joint one-hot actions) → scalar
  (the reference materializes n_agents identical copies of this input,
  maddpg.py:114-135 — collapsed here to a single evaluation).
- Critic targets: r + γ(1−ended)·Q'(s', â') with â' hard-sampled from
  the target actor at the next obs (maddpg.py:334-343). The reference
  never bootstraps an episode's final step (maddpg.py:336-338 with all
  MPE episodes hitting the padded max length), reproduced by killing
  the bootstrap on ``ended`` (done OR truncated).
- Actor loss: −E[Q(s, [â_i, a_{−i}])] with agent i's action re-sampled
  *soft* from the current policy and the others taken from the buffer —
  the reference's eye-mask ``grad_processing`` (maddpg.py:120-134,
  355-367) expressed as a vmap over the substituted agent.
- Episode replay + per-episode cadence, polyak on actor+critic.
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

from cleanmarl_tpu.buffers.episode import EpisodeAccumulator, EpisodeBuffer
from cleanmarl_tpu.core import cadence
from cleanmarl_tpu.core import networks as nets
from cleanmarl_tpu.core.acting import masked_argmax
from cleanmarl_tpu.core.evaluation import make_evaluator
from cleanmarl_tpu.core.logger import Logger
from cleanmarl_tpu.core.metrics import EpisodeStats
from cleanmarl_tpu.core.rewards import standardize
from cleanmarl_tpu.core.optim import make_optimizer
from cleanmarl_tpu.envs import registry
from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.envs.external import as_vec


@dataclass
class MADDPGConfig:
    # defaults follow maddpg.py:17-76
    env_type: str = "matrix"
    env_name: str = ""
    env_family: str = "mpe"
    agent_ids: bool = True
    num_envs: int = 16
    buffer_size: int = 5000          # episodes
    total_timesteps: int = 1_000_000
    gamma: float = 0.99
    train_freq: int = 1              # updates every N completed episodes
    optimizer: str = "adam"
    learning_rate_actor: float = 3e-4
    learning_rate_critic: float = 3e-4
    batch_size: int = 10             # episodes per update
    recurrent: bool = False          # GRU actor (maddpg_lstm.py:79-101)
    actor_hidden_dim: int = 32
    actor_num_layers: int = 1
    critic_hidden_dim: int = 128
    critic_num_layers: int = 1
    gumbel_tau: float = 1.0
    normalize_reward: bool = True    # reference default True (maddpg.py:33)
    max_updates_per_iter: int = 0    # cap updates per vectorized iteration;
    # surplus carries as debt (core/cadence.py). 0 = uncapped (exact
    # per-crossing semantics; per-iteration cost grows with num_envs)
    target_network_update_freq: int = 1
    polyak: float = 0.005
    clip_gradients: float = -1.0
    log_interval: int = 500
    eval_steps: int = 5000
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


def gumbel_softmax(key, logits, tau: float = 1.0, hard: bool = True):
    """Straight-through Gumbel-softmax (maddpg_jax.py:76-98 semantics)."""
    g = jax.random.gumbel(key, logits.shape)
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        one_hot = jax.nn.one_hot(jnp.argmax(y, axis=-1), logits.shape[-1])
        y = jax.lax.stop_gradient(one_hot - y) + y  # straight-through
    return y


@chex.dataclass(frozen=True)
class MADDPGRunnerState:
    actor_params: Any
    critic_params: Any
    target_actor: Any
    target_critic: Any
    actor_opt: Any
    critic_opt: Any
    ring: EpisodeBuffer
    acc: EpisodeAccumulator
    env_state: Any
    obs: chex.Array
    state: chex.Array
    avail: chex.Array
    actor_h: chex.Array  # (num_envs, n_agents, H); zeros when FF
    stats: EpisodeStats
    step: chex.Array
    episodes: chex.Array
    update_debt: chex.Array  # () int32 due-but-deferred updates (cadence.py)
    last_actor_loss: chex.Array
    last_critic_loss: chex.Array
    last_actor_gnorm: chex.Array
    last_critic_gnorm: chex.Array
    num_updates: chex.Array
    key: chex.PRNGKey


def make_train(cfg: MADDPGConfig, env=None):
    if env is None:
        env = registry.make(cfg.env_type, cfg.env_name, agent_ids=cfg.agent_ids,
                            env_family=cfg.env_family)
    vec = as_vec(env, cfg.num_envs)
    actor_opt = make_optimizer(cfg.optimizer, cfg.learning_rate_actor, cfg.clip_gradients)
    critic_opt = make_optimizer(cfg.optimizer, cfg.learning_rate_critic, cfg.clip_gradients)
    t_max = env.episode_limit
    joint_dim = env.n_agents * env.n_actions
    critic_in = env.state_dim + joint_dim

    H = cfg.actor_hidden_dim

    def actor_step(params, h, obs, avail):
        """→ (h', masked logits). h passes through for the FF actor."""
        if cfg.recurrent:
            h2, logits = nets.rnn_apply(params, h, obs)
            return h2, nets.masked_q(logits, avail)
        return h, nets.masked_q(nets.mlp_apply(params, obs), avail)

    def actor_logits(params, obs, avail):
        """FF path only (used when not recurrent)."""
        return nets.masked_q(nets.mlp_apply(params, obs), avail)

    def actor_logits_episodes(params, obs_bt, avail_bt):
        """Logits over episode batches (B, T, n, ·); episodes start at
        t=0 so the GRU carry starts at zeros, no mid-row resets."""
        if not cfg.recurrent:
            return actor_logits(params, obs_bt, avail_bt)
        obs_tm = jnp.moveaxis(obs_bt, 0, 1)      # (T, B, n, O)
        avail_tm = jnp.moveaxis(avail_bt, 0, 1)
        h0 = jnp.zeros(obs_tm.shape[1:-1] + (H,))
        # input projection + head hoisted out of the scan (rnn_seq_apply)
        _, logits = nets.rnn_seq_apply(params, h0, obs_tm)
        return jnp.moveaxis(nets.masked_q(logits, avail_tm), 0, 1)

    def target_next_logits_episodes(params, obs_bt, next_obs_bt, next_avail_bt):
        """Target-actor logits at the NEXT obs of every step: the hidden
        stream advances on obs_t and is evaluated one GRU step ahead on
        next_obs_t (exact at terminal steps; within an episode
        next_obs_t == obs_{t+1})."""
        if not cfg.recurrent:
            return actor_logits(params, next_obs_bt, next_avail_bt)
        obs_tm = jnp.moveaxis(obs_bt, 0, 1)
        next_tm = jnp.moveaxis(next_obs_bt, 0, 1)
        na_tm = jnp.moveaxis(next_avail_bt, 0, 1)
        h0 = jnp.zeros(obs_tm.shape[1:-1] + (H,))
        logits = nets.rnn_seq_eval_next(params, h0, obs_tm, next_tm)
        return jnp.moveaxis(nets.masked_q(logits, na_tm), 0, 1)

    def critic_q(params, state, joint_onehot):
        """state (..., S), joint_onehot (..., n, A) → Q (...)."""
        flat = joint_onehot.reshape(joint_onehot.shape[:-2] + (joint_dim,))
        x = jnp.concatenate([state, flat], axis=-1)
        return nets.mlp_apply(params, x)[..., 0]

    def example_record():
        return {
            "obs": jnp.zeros((env.n_agents, env.obs_dim)),
            "state": jnp.zeros((env.state_dim,)),
            "avail": jnp.zeros((env.n_agents, env.n_actions), jnp.bool_),
            "action": jnp.zeros((env.n_agents, env.n_actions)),  # one-hot
            "reward": jnp.zeros(()),
            "ended": jnp.zeros((), jnp.bool_),
            "next_obs": jnp.zeros((env.n_agents, env.obs_dim)),
            "next_state": jnp.zeros((env.state_dim,)),
            "next_avail": jnp.zeros((env.n_agents, env.n_actions), jnp.bool_),
        }

    def init(key: chex.PRNGKey) -> MADDPGRunnerState:
        ka, kc, kreset, key = jax.random.split(key, 4)
        if cfg.recurrent:
            actor_params = nets.rnn_init(
                ka, env.obs_dim, H, env.n_actions, final_gain=0.01
            )
        else:
            actor_params = nets.mlp_init(
                ka, env.obs_dim, cfg.actor_hidden_dim, env.n_actions,
                cfg.actor_num_layers, final_gain=0.01,
            )
        critic_params = nets.mlp_init(
            kc, critic_in, cfg.critic_hidden_dim, 1, cfg.critic_num_layers
        )
        env_state, ts = vec.reset(kreset)
        return MADDPGRunnerState(
            actor_params=actor_params,
            critic_params=critic_params,
            target_actor=jax.tree.map(jnp.copy, actor_params),
            target_critic=jax.tree.map(jnp.copy, critic_params),
            actor_opt=actor_opt.init(actor_params),
            critic_opt=critic_opt.init(critic_params),
            ring=EpisodeBuffer.create(cfg.buffer_size, t_max, example_record()),
            acc=EpisodeAccumulator.create(cfg.num_envs, t_max, example_record()),
            env_state=env_state,
            obs=ts.obs, state=ts.state, avail=ts.avail,
            actor_h=jnp.zeros((cfg.num_envs, env.n_agents, H)),
            stats=EpisodeStats.create(cfg.num_envs),
            step=jnp.zeros((), jnp.int32),
            episodes=jnp.zeros((), jnp.int32),
            update_debt=jnp.zeros((), jnp.int32),
            last_actor_loss=jnp.zeros(()), last_critic_loss=jnp.zeros(()),
            last_actor_gnorm=jnp.zeros(()), last_critic_gnorm=jnp.zeros(()),
            num_updates=jnp.zeros((), jnp.int32),
            key=key,
        )

    def update(runner, ring, key):
        k_sample, k_tgt, k_fresh = jax.random.split(key, 3)
        batch, mask = ring.sample(k_sample, cfg.batch_size)  # leaves (B,T,...)

        # ---- critic ---------------------------------------------------
        next_logits = target_next_logits_episodes(
            runner.target_actor, batch["obs"], batch["next_obs"],
            batch["next_avail"],
        )
        a_next = gumbel_softmax(k_tgt, next_logits, cfg.gumbel_tau, hard=True)
        q_next = critic_q(runner.target_critic, batch["next_state"], a_next)
        ended = batch["ended"].astype(jnp.float32)
        reward = batch["reward"]
        if cfg.normalize_reward:
            # masked per-sampled-batch standardization (maddpg.py:178-182)
            reward = standardize(reward, mask)
        target = reward + cfg.gamma * (1.0 - ended) * q_next
        msum = jnp.maximum(jnp.sum(mask), 1.0)

        def critic_loss_fn(p):
            q = critic_q(p, batch["state"], batch["action"])
            return jnp.sum(jnp.square(target - q) * mask) / msum

        c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(runner.critic_params)
        c_gnorm = nets.global_norm(c_grads)
        c_updates, c_opt = critic_opt.update(
            c_grads, runner.critic_opt, runner.critic_params
        )
        critic_params = optax.apply_updates(runner.critic_params, c_updates)

        # ---- actor ----------------------------------------------------
        eye = jnp.eye(env.n_agents)[:, :, None]  # (i, n, 1)

        def actor_loss_fn(p):
            logits = actor_logits_episodes(p, batch["obs"], batch["avail"])
            fresh = gumbel_softmax(k_fresh, logits, cfg.gumbel_tau, hard=False)

            def q_with_agent_i(i_onehot):
                # joint = fresh for agent i, stored for the others
                joint = i_onehot * fresh + (1.0 - i_onehot) * batch["action"]
                return critic_q(critic_params, batch["state"], joint)  # (B,T)

            q_all = jax.vmap(q_with_agent_i)(eye)          # (n, B, T)
            return -jnp.sum(q_all * mask[None]) / msum

        a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(runner.actor_params)
        a_gnorm = nets.global_norm(a_grads)
        a_updates, a_opt = actor_opt.update(
            a_grads, runner.actor_opt, runner.actor_params
        )
        actor_params = optax.apply_updates(runner.actor_params, a_updates)
        return (
            actor_params, critic_params, a_opt, c_opt,
            a_loss, c_loss, a_gnorm, c_gnorm,
        )

    def train_iter(runner: MADDPGRunnerState, _):
        key, k_act, k_step, k_upd = jax.random.split(runner.key, 4)
        h2, logits = actor_step(
            runner.actor_params, runner.actor_h, runner.obs, runner.avail
        )
        onehot = gumbel_softmax(k_act, logits, cfg.gumbel_tau, hard=True)
        actions = jnp.argmax(onehot, axis=-1).astype(jnp.int32)
        env_state, ts2, final = vec.step(runner.env_state, actions, k_step)
        ended = jnp.logical_or(ts2.done, ts2.truncated)
        h2 = jnp.where(ended[:, None, None], 0.0, h2)
        record = {
            "obs": runner.obs,
            "state": runner.state,
            "avail": runner.avail.astype(jnp.bool_),
            "action": onehot,
            "reward": ts2.reward,
            "ended": ended,
            "next_obs": final.obs,
            "next_state": final.state,
            "next_avail": final.avail.astype(jnp.bool_),
        }
        acc, ring = runner.acc.add_step(runner.ring, record, ended)
        stats = runner.stats.step(
            ts2.reward, ended, ts2.info.get("battle_won", jnp.zeros_like(ts2.reward))
        )
        step = runner.step + 1
        episodes = runner.episodes + jnp.sum(ended.astype(jnp.int32))

        # cadence: one update per train_freq COMPLETED EPISODES
        # (maddpg.py:334). Synchronized vectorized envs can finish many
        # episodes in one iteration (MPE: all num_envs truncate together),
        # so run one update per crossing rather than collapsing the burst
        # into a single update; max_updates_per_iter caps the per-
        # iteration slot count, surplus carried as debt (core/cadence.py).
        warm = ring.size >= cfg.batch_size
        due = jnp.where(
            warm,
            episodes // cfg.train_freq - runner.episodes // cfg.train_freq,
            0,
        )
        n_slots = cadence.num_slots(cfg.max_updates_per_iter, cfg.num_envs)
        n_run, debt = cadence.bounded_due(runner.update_debt, due, n_slots)

        def update_slot(carry, k):
            r = runner.replace(
                actor_params=carry[0], critic_params=carry[1],
                actor_opt=carry[2], critic_opt=carry[3],
            )
            return update(r, ring, k)

        carry0 = (
            runner.actor_params, runner.critic_params,
            runner.actor_opt, runner.critic_opt,
            runner.last_actor_loss, runner.last_critic_loss,
            runner.last_actor_gnorm, runner.last_critic_gnorm,
        )
        (actor_params, critic_params, a_opt, c_opt,
         a_loss, c_loss, a_gnorm, c_gnorm) = cadence.run_due_updates(
            carry0, update_slot, k_upd, n_run, n_slots
        )
        # k polyak steps collapse exactly to one with 1-(1-τ)^k;
        # crossings counted on the serviced-update clock (cadence.target_due)
        due_t = cadence.target_due(
            runner.num_updates, n_run,
            cfg.train_freq, cfg.target_network_update_freq,
        )
        tau_eff = 1.0 - jnp.power(1.0 - cfg.polyak, due_t.astype(jnp.float32))
        target_actor, target_critic = jax.lax.cond(
            due_t > 0,
            lambda: (
                nets.soft_update(runner.target_actor, actor_params, tau_eff),
                nets.soft_update(runner.target_critic, critic_params, tau_eff),
            ),
            lambda: (runner.target_actor, runner.target_critic),
        )
        runner = runner.replace(
            actor_params=actor_params, critic_params=critic_params,
            target_actor=target_actor, target_critic=target_critic,
            actor_opt=a_opt, critic_opt=c_opt,
            ring=ring, acc=acc, env_state=env_state,
            obs=ts2.obs, state=ts2.state, avail=ts2.avail, actor_h=h2,
            stats=stats, step=step, episodes=episodes, update_debt=debt,
            last_actor_loss=a_loss, last_critic_loss=c_loss,
            last_actor_gnorm=a_gnorm, last_critic_gnorm=c_gnorm,
            num_updates=runner.num_updates + n_run,
            key=key,
        )
        return runner, None

    @partial(jax.jit, donate_argnums=0)
    def train_block(runner: MADDPGRunnerState):
        runner, _ = jax.lax.scan(train_iter, runner, None, length=cfg.log_interval)
        metrics = {
            **runner.stats.rollout_metrics(),
            "train/actor_loss": runner.last_actor_loss,
            "train/critic_loss": runner.last_critic_loss,
            "train/actor_gradients": runner.last_actor_gnorm,
            "train/critic_gradients": runner.last_critic_gnorm,
            "train/num_updates": runner.num_updates,
            # nonzero = capped cadence deferring updates (core/cadence.py)
            "train/update_debt": runner.update_debt,
        }
        return runner.replace(stats=runner.stats.flush()), metrics

    def greedy_policy(params, carry, obs, avail, key):
        # eval = argmax of masked logits (maddpg.py:396-400)
        carry, logits = actor_step(params, carry, obs, avail)
        return carry, masked_argmax(logits, avail)

    eval_fn = jax.jit(
        make_evaluator(
            env, cfg.num_eval_ep, greedy_policy,
            init_carry=lambda m: jnp.zeros((m, env.n_agents, H)),
        )
    )
    return init, train_block, eval_fn


def train(cfg: MADDPGConfig, env=None, logger: Logger | None = None,
          algo_name: str = "MADDPG"):
    from cleanmarl_tpu.core.driver import run_training
    from cleanmarl_tpu.distributed.dp import DATA_FIELD_DIMS

    init, train_block, eval_fn = make_train(cfg, env)
    return run_training(
        algo_name, cfg, init, train_block, eval_fn,
        steps_per_block=cfg.num_envs * cfg.log_interval,
        eval_params=lambda r: r.actor_params,
        steps_of=lambda r: int(r.step) * cfg.num_envs,
        print_keys=("rollout/ep_reward", "train/critic_loss"),
        logger=logger,
        data_field_dims=DATA_FIELD_DIMS["MADDPG"],
    )


def main():
    from cleanmarl_tpu.core.cli import cli

    train(cli(MADDPGConfig, description=__doc__))


if __name__ == "__main__":
    main()
