"""QMIX — monotonic value factorisation with a state-conditioned
hypernetwork mixer.

TPU-native rebuild of /root/reference/cleanmarl/qmix.py (+ qmix_jax.py,
qmix_multienvs.py): episodes are assembled on-device from the auto-reset
env batch (EpisodeAccumulator replaces the alive-envs Python collection,
qmix_multienvs.py:423-472), stored in a fixed-T HBM episode ring, and
the update is the dense masked TD loss over the whole (B, T) block at
once (the reference's per-timestep Python loop, qmix.py:391-414, is the
JAX port's dense form qmix_jax.py:296-334):

    target  = r_t + γ(1−d_t)·Mixer'(max_a Q'(o_{t+1}), s_{t+1})
    loss    = Σ_{b,t} m_{b,t}·(target − Mixer(Q(o_t)[a_t], s_t))² / Σ m

One optimizer covers Q-net + mixer (qmix.py:428; nnx.Dict grouping in
qmix_jax.py:373-386). Update/target cadence counts *completed episodes*
(qmix.py:377, 434), preserved here via an on-device episode counter.
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
from cleanmarl_tpu.core.acting import eps_greedy, masked_argmax
from cleanmarl_tpu.core.evaluation import make_evaluator
from cleanmarl_tpu.core.logger import Logger
from cleanmarl_tpu.core.metrics import EpisodeStats
from cleanmarl_tpu.core.optim import make_optimizer
from cleanmarl_tpu.core.schedules import linear_schedule
from cleanmarl_tpu.envs import registry
from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.envs.external import as_vec


@dataclass
class QMIXConfig:
    # defaults follow qmix.py:17-76
    env_type: str = "matrix"
    env_name: str = ""
    env_family: str = "mpe"
    agent_ids: bool = True
    num_envs: int = 16
    buffer_size: int = 5000          # capacity in EPISODES (qmix.py:27)
    total_timesteps: int = 1_000_000
    gamma: float = 0.99
    train_freq: int = 1              # update every N completed episodes
    optimizer: str = "adam"
    learning_rate: float = 5e-4
    batch_size: int = 10             # episodes per update batch
    start_e: float = 1.0
    end_e: float = 0.025
    exploration_fraction: float = 0.05
    hidden_dim: int = 64
    hyper_dim: int = 64
    embed_dim: int = 32
    num_layers: int = 1
    target_network_update_freq: int = 1  # polyak every N completed episodes
    polyak: float = 0.01
    normalize_reward: bool = False   # per-batch masked standardize (qmix.py:190)
    hard_target: bool = False        # periodic hard target copy instead of
    # polyak — the pymarl-lineage stabilizer for mixer bootstrap drift;
    # target_network_update_freq then means episodes between full copies
    double_q: bool = True            # Double Q-learning targets (pymarl
    # default; the reference's plain max, double_q=False, diverges on
    # dense-negative-reward envs — maximization bias compounds through
    # the mixer)
    bootstrap_truncation: bool = False  # True = the reference's raw-done
    # storage (qmix.py:362): truncation bootstraps through (infinite-
    # horizon values, a divergence channel on always-truncating envs).
    # False (default) cuts the target at time limits (episodic values,
    # as MADDPG/FACMAC here already do via `ended`).
    memefficient: bool = False       # store-once episode layout (qmix_memefficient.py)
    max_updates_per_iter: int = 0    # cap updates per vectorized iteration;
    # surplus carries as debt (core/cadence.py). 0 = uncapped (exact
    # per-crossing semantics; per-iteration cost grows with num_envs)
    clip_gradients: float = -1.0
    log_interval: int = 500
    eval_steps: int = 5000
    num_eval_ep: int = 5
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
class QMIXRunnerState:
    params: Any              # {"q": ..., "mixer": ...}
    target_params: Any
    opt_state: Any
    ring: EpisodeBuffer
    acc: EpisodeAccumulator
    env_state: Any
    obs: chex.Array
    state: chex.Array
    avail: chex.Array
    stats: EpisodeStats
    step: chex.Array         # () int32 vectorized iterations
    episodes: chex.Array     # () int32 completed episodes (cadence counter)
    update_debt: chex.Array  # () int32 due-but-deferred updates (cadence.py)
    last_loss: chex.Array
    last_gnorm: chex.Array
    num_updates: chex.Array
    key: chex.PRNGKey


def make_train(cfg: QMIXConfig, env=None):
    if env is None:
        env = registry.make(cfg.env_type, cfg.env_name, agent_ids=cfg.agent_ids,
                            env_family=cfg.env_family)
    vec = as_vec(env, cfg.num_envs)
    opt = make_optimizer(cfg.optimizer, cfg.learning_rate, cfg.clip_gradients)
    eps_duration = cfg.exploration_fraction * cfg.total_timesteps
    t_max = env.episode_limit

    def example_record():
        rec = {
            "obs": jnp.zeros((env.n_agents, env.obs_dim)),
            "state": jnp.zeros((env.state_dim,)),
            "action": jnp.zeros((env.n_agents,), jnp.int32),
            "reward": jnp.zeros(()),
            "done": jnp.zeros((), jnp.bool_),
        }
        if cfg.memefficient:
            # store-once layout (qmix_memefficient.py): next_* derived at
            # sample time from the t+1 slice; the final step of every
            # episode then trains on reward alone
            # (qmix_memefficient.py:374-387)
            rec["avail"] = jnp.zeros((env.n_agents, env.n_actions), jnp.bool_)
        else:
            rec.update(
                next_obs=jnp.zeros((env.n_agents, env.obs_dim)),
                next_state=jnp.zeros((env.state_dim,)),
                next_avail=jnp.zeros((env.n_agents, env.n_actions), jnp.bool_),
            )
        return rec

    def init(key: chex.PRNGKey) -> QMIXRunnerState:
        kq, km, kreset, key = jax.random.split(key, 4)
        params = {
            "q": nets.mlp_init(
                kq, env.obs_dim, cfg.hidden_dim, env.n_actions, cfg.num_layers
            ),
            "mixer": nets.mixer_init(
                km, env.n_agents, env.state_dim, cfg.embed_dim, cfg.hyper_dim
            ),
        }
        env_state, ts = vec.reset(kreset)
        return QMIXRunnerState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=opt.init(params),
            ring=EpisodeBuffer.create(cfg.buffer_size, t_max, example_record()),
            acc=EpisodeAccumulator.create(cfg.num_envs, t_max, example_record()),
            env_state=env_state,
            obs=ts.obs,
            state=ts.state,
            avail=ts.avail,
            stats=EpisodeStats.create(cfg.num_envs),
            step=jnp.zeros((), jnp.int32),
            episodes=jnp.zeros((), jnp.int32),
            update_debt=jnp.zeros((), jnp.int32),
            last_loss=jnp.zeros(()),
            last_gnorm=jnp.zeros(()),
            num_updates=jnp.zeros((), jnp.int32),
            key=key,
        )

    def update(params, target_params, opt_state, ring, key):
        batch, mask = ring.sample(key, cfg.batch_size)
        reward = batch["reward"]
        if cfg.normalize_reward:
            from cleanmarl_tpu.core.rewards import standardize

            reward = standardize(reward, mask)
        if cfg.memefficient:
            # next_* = t+1 slice of the stored streams; the wrapped last
            # row is neutralized by has_next
            next_obs = jnp.roll(batch["obs"], -1, axis=1)
            next_state = jnp.roll(batch["state"], -1, axis=1)
            next_avail = jnp.roll(batch["avail"], -1, axis=1)
            has_next = jnp.roll(mask, -1, axis=1).at[:, -1].set(0.0)
        else:
            next_obs = batch["next_obs"]
            next_state = batch["next_state"]
            next_avail = batch["next_avail"]
            has_next = jnp.ones_like(mask)
        q_next_t = nets.masked_q(
            nets.mlp_apply(target_params["q"], next_obs), next_avail
        )
        if cfg.double_q:
            # Double Q: argmax by the ONLINE net, value by the TARGET
            # net (pymarl's qmix default). Plain max diverges here: the
            # per-step maximization bias δ compounds through the mixer
            # (qtot_next − qtot ≈ +37 > |r| persistently on
            # simple_spread, Q_tot → +∞; see test_qmix_double_q_*).
            q_next_o = nets.masked_q(
                nets.mlp_apply(params["q"], next_obs), next_avail
            )
            a_star = jnp.argmax(q_next_o, axis=-1)
            q_next_max = jnp.take_along_axis(
                q_next_t, a_star[..., None], axis=-1
            )[..., 0]                                             # (B,T,n)
        else:
            q_next_max = q_next_t.max(axis=-1)                    # (B,T,n)
        qtot_next = nets.mixer_apply(
            target_params["mixer"], q_next_max, next_state
        )                                                         # (B,T)
        done = batch["done"].astype(jnp.float32)
        target = reward + cfg.gamma * (1.0 - done) * has_next * qtot_next

        def loss_fn(p):
            q = nets.mlp_apply(p["q"], batch["obs"])
            q_taken = jnp.take_along_axis(
                q, batch["action"][..., None], axis=-1
            )[..., 0]
            qtot = nets.mixer_apply(p["mixer"], q_taken, batch["state"])
            err = jnp.square(target - qtot) * mask
            return jnp.sum(err) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = nets.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, gnorm

    def train_iter(runner: QMIXRunnerState, _):
        key, k_act, k_step, k_sample = jax.random.split(runner.key, 4)
        env_steps = runner.step * cfg.num_envs
        epsilon = linear_schedule(cfg.start_e, cfg.end_e, eps_duration, env_steps)
        q = nets.mlp_apply(runner.params["q"], runner.obs)
        actions = eps_greedy(k_act, q, runner.avail, epsilon)
        env_state, ts2, final = vec.step(runner.env_state, actions, k_step)
        ended = jnp.logical_or(ts2.done, ts2.truncated)
        record = {
            "obs": runner.obs,
            "state": runner.state,
            "action": actions,
            "reward": ts2.reward,
            "done": ts2.done if cfg.bootstrap_truncation else ended,
        }
        if cfg.memefficient:
            record["avail"] = runner.avail.astype(jnp.bool_)
        else:
            record.update(
                next_obs=final.obs,
                next_state=final.state,
                next_avail=final.avail.astype(jnp.bool_),
            )
        acc, ring = runner.acc.add_step(runner.ring, record, ended)
        stats = runner.stats.step(
            ts2.reward, ended, ts2.info.get("battle_won", jnp.zeros_like(ts2.reward))
        )
        step = runner.step + 1
        episodes = runner.episodes + jnp.sum(ended.astype(jnp.int32))

        # cadence: the reference updates once per train_freq COMPLETED
        # EPISODES (qmix.py:377). Synchronized vectorized envs can finish
        # many episodes in one iteration (MPE: all num_envs truncate
        # together), so run one update per crossing rather than collapsing
        # them into one. (Collapsing left the bootstrap ~num_envs×
        # under-trained and Q_tot drifted optimistic without bound on
        # simple_spread: +5 → +26 while true returns are negative;
        # validation/tune_qmix_spread.jsonl.) max_updates_per_iter caps
        # the per-iteration slot count; the surplus carries as debt.
        warm = ring.size >= cfg.batch_size
        due = jnp.where(
            warm,
            episodes // cfg.train_freq - runner.episodes // cfg.train_freq,
            0,
        )
        n_slots = cadence.num_slots(cfg.max_updates_per_iter, cfg.num_envs)
        n_run, debt = cadence.bounded_due(runner.update_debt, due, n_slots)

        def update_slot(carry, k):
            params, opt_state, _, _ = carry
            return update(params, runner.target_params, opt_state, ring, k)

        params, opt_state, loss, gnorm = cadence.run_due_updates(
            (runner.params, runner.opt_state, runner.last_loss,
             runner.last_gnorm),
            update_slot, k_sample, n_run, n_slots,
        )
        # k polyak steps collapse exactly to one with 1-(1-τ)^k;
        # crossings counted on the serviced-update clock (cadence.target_due)
        due_t = cadence.target_due(
            runner.num_updates, n_run,
            cfg.train_freq, cfg.target_network_update_freq,
        )
        if cfg.hard_target:
            tau_eff = 1.0
        else:
            tau_eff = 1.0 - jnp.power(
                1.0 - cfg.polyak, due_t.astype(jnp.float32)
            )
        target_params = jax.lax.cond(
            due_t > 0,
            lambda: nets.soft_update(runner.target_params, params, tau_eff),
            lambda: runner.target_params,
        )
        runner = runner.replace(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            ring=ring,
            acc=acc,
            env_state=env_state,
            obs=ts2.obs,
            state=ts2.state,
            avail=ts2.avail,
            stats=stats,
            step=step,
            episodes=episodes,
            update_debt=debt,
            last_loss=loss,
            last_gnorm=gnorm,
            num_updates=runner.num_updates + n_run,
            key=key,
        )
        return runner, epsilon

    @partial(jax.jit, donate_argnums=0)
    def train_block(runner: QMIXRunnerState):
        runner, epsilons = jax.lax.scan(
            train_iter, runner, None, length=cfg.log_interval
        )
        metrics = {
            **runner.stats.rollout_metrics(),
            "rollout/epsilon": epsilons[-1],
            "train/loss": runner.last_loss,
            "train/grads": runner.last_gnorm,
            "train/num_updates": runner.num_updates,
            # nonzero = max_updates_per_iter deferred due updates; a
            # GROWING value means sustained overload — scale train_freq
            # with the env batch (core/cadence.py)
            "train/update_debt": runner.update_debt,
        }
        return runner.replace(stats=runner.stats.flush()), metrics

    def greedy_policy(params, carry, obs, avail, key):
        return carry, masked_argmax(nets.mlp_apply(params["q"], obs), avail)

    eval_fn = jax.jit(make_evaluator(env, cfg.num_eval_ep, greedy_policy))
    return init, train_block, eval_fn


def train(cfg: QMIXConfig, env=None, logger: Logger | None = None):
    from cleanmarl_tpu.core.driver import run_training
    from cleanmarl_tpu.distributed.dp import DATA_FIELD_DIMS

    init, train_block, eval_fn = make_train(cfg, env)
    return run_training(
        "QMIX", cfg, init, train_block, eval_fn,
        steps_per_block=cfg.num_envs * cfg.log_interval,
        eval_params=lambda r: r.params,
        steps_of=lambda r: int(r.step) * cfg.num_envs,
        print_keys=("rollout/ep_reward", "train/loss"),
        logger=logger,
        data_field_dims=DATA_FIELD_DIMS["QMIX"],
    )


def main():
    from cleanmarl_tpu.core.cli import cli

    train(cli(QMIXConfig, description=__doc__))


if __name__ == "__main__":
    main()
