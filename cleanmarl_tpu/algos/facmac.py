"""FACMAC — factored multi-agent centralized policy gradients
(MADDPG-style actor + QMIX-style monotonic mixing of per-agent
utilities).

TPU-native rebuild of /root/reference/cleanmarl/facmac.py
(+ facmac_multienvs.py, facmac_jax.py):

- Per-agent utility Q(obs_i ‖ a_i one-hot) → scalar (facmac.py:117-132),
  mixed to a team Q_tot by the QMIX hypernetwork on the global state
  (facmac.py:134-165 — the same mixer as qmix.py:98-123).
- Critic loss: masked MSE of Mixer(Q(o,a), s) against
  r + γ(1−ended)·Mixer'(Q'(o', â'), s') with â' hard Gumbel samples
  from the target actor (facmac.py:436-473); one optimizer over
  utility + mixer (facmac.py:320-323). The final episode step never
  bootstraps (facmac.py:438-440) — reproduced via ``ended``.
- Actor loss: −Q_tot with *fresh soft* actions for every agent at once
  (centralized gradient through the mixer, facmac.py:486-500; the
  reference's randperm over t is irrelevant to the summed loss).
- Exploration: ε-mixture of Gumbel-softmax policy and the avail-uniform
  distribution, ε scheduled over TRAINING UPDATES (0.5 → 0.002 over
  750 updates, facmac.py:62-67, 368-369 — COMA's schedule).
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

from cleanmarl_tpu.algos.maddpg import gumbel_softmax
from cleanmarl_tpu.buffers.episode import EpisodeAccumulator, EpisodeBuffer
from cleanmarl_tpu.core import cadence
from cleanmarl_tpu.core import networks as nets
from cleanmarl_tpu.core.acting import masked_argmax
from cleanmarl_tpu.core.evaluation import make_evaluator
from cleanmarl_tpu.core.logger import Logger
from cleanmarl_tpu.core.metrics import EpisodeStats
from cleanmarl_tpu.core.rewards import standardize
from cleanmarl_tpu.core.optim import make_optimizer
from cleanmarl_tpu.core.schedules import linear_schedule
from cleanmarl_tpu.envs import registry
from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.envs.external import as_vec


@dataclass
class FACMACConfig:
    env_type: str = "matrix"
    env_name: str = ""
    env_family: str = "mpe"
    agent_ids: bool = True
    num_envs: int = 16
    buffer_size: int = 5000
    total_timesteps: int = 1_000_000
    gamma: float = 0.99
    train_freq: int = 1
    optimizer: str = "adam"
    learning_rate_actor: float = 3e-4
    learning_rate_critic: float = 3e-4
    batch_size: int = 10
    actor_hidden_dim: int = 32
    actor_num_layers: int = 1
    critic_hidden_dim: int = 128
    critic_num_layers: int = 1
    hyper_dim: int = 64
    embed_dim: int = 32
    gumbel_tau: float = 1.0
    normalize_reward: bool = False   # masked batch standardization (facmac.py:34)
    start_e: float = 0.5
    end_e: float = 0.002
    exploration_fraction: float = 750.0   # in training updates (facmac.py:66)
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


@chex.dataclass(frozen=True)
class FACMACRunnerState:
    actor_params: Any
    critic_params: Any          # {"q": per-agent utility, "mixer": hypernet}
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


def make_train(cfg: FACMACConfig, env=None):
    if env is None:
        env = registry.make(cfg.env_type, cfg.env_name, agent_ids=cfg.agent_ids,
                            env_family=cfg.env_family)
    vec = as_vec(env, cfg.num_envs)
    actor_opt = make_optimizer(cfg.optimizer, cfg.learning_rate_actor, cfg.clip_gradients)
    critic_opt = make_optimizer(cfg.optimizer, cfg.learning_rate_critic, cfg.clip_gradients)
    t_max = env.episode_limit

    def actor_logits(params, obs, avail):
        return nets.masked_q(nets.mlp_apply(params, obs), avail)

    def utilities(qparams, obs, onehot):
        """Per-agent Q(obs_i ‖ a_i) → (..., n_agents)."""
        x = jnp.concatenate([obs, onehot], axis=-1)
        return nets.mlp_apply(qparams, x)[..., 0]

    def q_tot(cparams, obs, onehot, state):
        return nets.mixer_apply(
            cparams["mixer"], utilities(cparams["q"], obs, onehot), state
        )

    def eps_mixture_sample(key, logits, avail, epsilon):
        """(1−ε)·gumbel_softmax(logits) + ε·uniform(avail), sampled
        (facmac.py:100-105)."""
        kg, kc = jax.random.split(key)
        soft = gumbel_softmax(kg, logits, cfg.gumbel_tau, hard=False)
        availf = avail.astype(jnp.float32)
        uni = availf / jnp.maximum(availf.sum(-1, keepdims=True), 1.0)
        probs = (1.0 - epsilon) * soft + epsilon * uni
        return jax.random.categorical(kc, jnp.log(probs + 1e-10)).astype(jnp.int32)

    def example_record():
        return {
            "obs": jnp.zeros((env.n_agents, env.obs_dim)),
            "state": jnp.zeros((env.state_dim,)),
            "avail": jnp.zeros((env.n_agents, env.n_actions), jnp.bool_),
            "action": jnp.zeros((env.n_agents, env.n_actions)),
            "reward": jnp.zeros(()),
            "ended": jnp.zeros((), jnp.bool_),
            "next_obs": jnp.zeros((env.n_agents, env.obs_dim)),
            "next_state": jnp.zeros((env.state_dim,)),
            "next_avail": jnp.zeros((env.n_agents, env.n_actions), jnp.bool_),
        }

    def init(key: chex.PRNGKey) -> FACMACRunnerState:
        ka, kq, km, kreset, key = jax.random.split(key, 5)
        actor_params = nets.mlp_init(
            ka, env.obs_dim, cfg.actor_hidden_dim, env.n_actions,
            cfg.actor_num_layers, final_gain=0.01,
        )
        critic_params = {
            "q": nets.mlp_init(
                kq, env.obs_dim + env.n_actions, cfg.critic_hidden_dim, 1,
                cfg.critic_num_layers,
            ),
            "mixer": nets.mixer_init(
                km, env.n_agents, env.state_dim, cfg.embed_dim, cfg.hyper_dim
            ),
        }
        env_state, ts = vec.reset(kreset)
        return FACMACRunnerState(
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
        batch, mask = ring.sample(k_sample, cfg.batch_size)
        msum = jnp.maximum(jnp.sum(mask), 1.0)

        # ---- critic (utility + mixer) ---------------------------------
        next_logits = actor_logits(
            runner.target_actor, batch["next_obs"], batch["next_avail"]
        )
        a_next = gumbel_softmax(k_tgt, next_logits, cfg.gumbel_tau, hard=True)
        qtot_next = q_tot(
            runner.target_critic, batch["next_obs"], a_next, batch["next_state"]
        )
        ended = batch["ended"].astype(jnp.float32)
        reward = batch["reward"]
        if cfg.normalize_reward:
            # masked per-sampled-batch standardization (facmac.py:225-229)
            reward = standardize(reward, mask)
        target = reward + cfg.gamma * (1.0 - ended) * qtot_next

        def critic_loss_fn(p):
            qt = q_tot(p, batch["obs"], batch["action"], batch["state"])
            return jnp.sum(jnp.square(target - qt) * mask) / msum

        c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(runner.critic_params)
        c_gnorm = nets.global_norm(c_grads)
        c_updates, c_opt = critic_opt.update(
            c_grads, runner.critic_opt, runner.critic_params
        )
        critic_params = optax.apply_updates(runner.critic_params, c_updates)

        # ---- actor ----------------------------------------------------
        def actor_loss_fn(p):
            logits = actor_logits(p, batch["obs"], batch["avail"])
            fresh = gumbel_softmax(k_fresh, logits, cfg.gumbel_tau, hard=False)
            qt = q_tot(critic_params, batch["obs"], fresh, batch["state"])
            return -jnp.sum(qt * mask) / msum

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

    def train_iter(runner: FACMACRunnerState, _):
        key, k_act, k_step, k_upd = jax.random.split(runner.key, 4)
        epsilon = linear_schedule(
            cfg.start_e, cfg.end_e, cfg.exploration_fraction, runner.num_updates
        )
        logits = actor_logits(runner.actor_params, runner.obs, runner.avail)
        actions = eps_mixture_sample(k_act, logits, runner.avail, epsilon)
        onehot = jax.nn.one_hot(actions, env.n_actions)
        env_state, ts2, final = vec.step(runner.env_state, actions, k_step)
        ended = jnp.logical_or(ts2.done, ts2.truncated)
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
        # (facmac.py:427). Synchronized vectorized envs can finish many
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
            obs=ts2.obs, state=ts2.state, avail=ts2.avail,
            stats=stats, step=step, episodes=episodes, update_debt=debt,
            last_actor_loss=a_loss, last_critic_loss=c_loss,
            last_actor_gnorm=a_gnorm, last_critic_gnorm=c_gnorm,
            num_updates=runner.num_updates + n_run,
            key=key,
        )
        return runner, epsilon

    @partial(jax.jit, donate_argnums=0)
    def train_block(runner: FACMACRunnerState):
        runner, epsilons = jax.lax.scan(
            train_iter, runner, None, length=cfg.log_interval
        )
        metrics = {
            **runner.stats.rollout_metrics(),
            "rollout/epsilon": epsilons[-1],
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
        return carry, masked_argmax(nets.mlp_apply(params, obs), avail)

    eval_fn = jax.jit(make_evaluator(env, cfg.num_eval_ep, greedy_policy))
    return init, train_block, eval_fn


def train(cfg: FACMACConfig, env=None, logger: Logger | None = None):
    from cleanmarl_tpu.core.driver import run_training
    from cleanmarl_tpu.distributed.dp import DATA_FIELD_DIMS

    init, train_block, eval_fn = make_train(cfg, env)
    return run_training(
        "FACMAC", cfg, init, train_block, eval_fn,
        steps_per_block=cfg.num_envs * cfg.log_interval,
        eval_params=lambda r: r.actor_params,
        steps_of=lambda r: int(r.step) * cfg.num_envs,
        print_keys=("rollout/ep_reward", "train/critic_loss"),
        logger=logger,
        data_field_dims=DATA_FIELD_DIMS["FACMAC"],
    )


def main():
    from cleanmarl_tpu.core.cli import cli

    train(cli(FACMACConfig, description=__doc__))


if __name__ == "__main__":
    main()
