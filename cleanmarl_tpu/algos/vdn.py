"""VDN — Value Decomposition Networks (team Q = Σ per-agent Q).

TPU-native rebuild of /root/reference/cleanmarl/vdn.py (+ vdn_multienvs.py,
vdn_jax.py): the act→step→store→learn→polyak loop is one jitted XLA
program. Envs are a vmapped pure-JAX batch with on-device auto-reset;
the replay ring lives in HBM; the ε-greedy branch, the TD target
``r + γ(1-d)·Σᵢ max_a Qᵢ'`` (vdn.py:309-314) and the MSE on ``Σᵢ Qᵢ``
(vdn.py:316-320) are computed without any host round-trip. Cadence
follows the reference multienvs convention (vdn_multienvs.py:402,441):
``step`` counts env transitions (+num_envs per iteration), one update
per ``train_freq`` iterations with batch ``batch_size·num_envs``
transitions, polyak every ``target_network_update_freq`` iterations.
"""
from __future__ import annotations

import dataclasses
import time
from dataclasses import dataclass
from functools import partial
from typing import Any

import chex
import jax
import jax.numpy as jnp
import optax

from cleanmarl_tpu.buffers.transition import TransitionBuffer
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
from cleanmarl_tpu.types import Transition


@dataclass
class VDNConfig:
    # environment (names follow the reference Args, vdn.py:17-76)
    env_type: str = "matrix"
    env_name: str = ""
    env_family: str = "mpe"
    agent_ids: bool = True
    num_envs: int = 16
    # replay
    buffer_size: int = 50000            # capacity in transitions
    total_timesteps: int = 1_000_000    # env transitions
    gamma: float = 0.99
    learning_starts: int = 5000         # env transitions before updates
    train_freq: int = 2                 # update every N vectorized iters
    optimizer: str = "adam"
    learning_rate: float = 5e-4
    batch_size: int = 16                # per-env; effective = batch_size*num_envs
    start_e: float = 1.0
    end_e: float = 0.05
    exploration_fraction: float = 0.05
    hidden_dim: int = 64
    num_layers: int = 1
    target_network_update_freq: int = 1  # polyak every N vectorized iters
    polyak: float = 0.005
    normalize_reward: bool = False       # per-batch standardize (vdn.py:138-143)
    bootstrap_truncation: bool = False   # True = the reference's raw-done
    # storage (vdn.py:285): time-limit truncation bootstraps through, so
    # values are infinite-horizon (V ≈ r/(1−γ) on dense-reward envs) —
    # a known divergence channel. False (default) treats the time limit
    # as episodic: the stored done cuts the target at truncation, exactly
    # as MADDPG/FACMAC here already do via their `ended` field.
    clip_gradients: float = 5.0
    log_interval: int = 500             # vectorized iters per host log
    eval_steps: int = 5000              # env transitions between evals
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
class VDNRunnerState:
    params: Any
    target_params: Any
    opt_state: Any
    buffer: TransitionBuffer
    env_state: Any
    obs: chex.Array
    state: chex.Array
    avail: chex.Array
    stats: EpisodeStats
    step: chex.Array        # () int32 — vectorized iterations so far
    last_loss: chex.Array
    last_gnorm: chex.Array
    num_updates: chex.Array
    key: chex.PRNGKey


def make_train(cfg: VDNConfig, env=None):
    """Build (init_fn, train_block_fn, eval_fn). ``train_block_fn`` runs
    ``cfg.log_interval`` fully-jitted iterations and returns metrics."""
    if env is None:
        env = registry.make(cfg.env_type, cfg.env_name, agent_ids=cfg.agent_ids,
                            env_family=cfg.env_family)
    vec = as_vec(env, cfg.num_envs)
    opt = make_optimizer(cfg.optimizer, cfg.learning_rate, cfg.clip_gradients)
    eff_batch = cfg.batch_size * cfg.num_envs
    eps_duration = cfg.exploration_fraction * cfg.total_timesteps

    def q_apply(params, obs):
        return nets.mlp_apply(params, obs)

    def init(key: chex.PRNGKey) -> VDNRunnerState:
        knet, kreset, key = jax.random.split(key, 3)
        params = nets.mlp_init(
            knet, env.obs_dim, cfg.hidden_dim, env.n_actions, cfg.num_layers
        )
        env_state, ts = vec.reset(kreset)
        example = Transition(
            obs=jnp.zeros((env.n_agents, env.obs_dim)),
            state=jnp.zeros((env.state_dim,)),
            avail=jnp.zeros((env.n_agents, env.n_actions), jnp.bool_),
            action=jnp.zeros((env.n_agents,), jnp.int32),
            reward=jnp.zeros(()),
            done=jnp.zeros((), jnp.bool_),
            next_obs=jnp.zeros((env.n_agents, env.obs_dim)),
            next_state=jnp.zeros((env.state_dim,)),
            next_avail=jnp.zeros((env.n_agents, env.n_actions), jnp.bool_),
        )
        return VDNRunnerState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=opt.init(params),
            buffer=TransitionBuffer.create(cfg.buffer_size, example),
            env_state=env_state,
            obs=ts.obs,
            state=ts.state,
            avail=ts.avail,
            stats=EpisodeStats.create(cfg.num_envs),
            step=jnp.zeros((), jnp.int32),
            last_loss=jnp.zeros(()),
            last_gnorm=jnp.zeros(()),
            num_updates=jnp.zeros((), jnp.int32),
            key=key,
        )

    def update(params, target_params, opt_state, buffer, key):
        batch = buffer.sample(key, eff_batch)
        if cfg.normalize_reward:
            from cleanmarl_tpu.core.rewards import standardize

            batch = batch.replace(reward=standardize(batch.reward))
        q_next = nets.masked_q(
            q_apply(target_params, batch.next_obs), batch.next_avail
        )
        team_next = q_next.max(axis=-1).sum(axis=-1)
        target = batch.reward + cfg.gamma * (1.0 - batch.done.astype(jnp.float32)) * team_next

        def loss_fn(p):
            q = q_apply(p, batch.obs)
            q_taken = jnp.take_along_axis(q, batch.action[..., None], axis=-1)[..., 0]
            pred = q_taken.sum(axis=-1)
            return jnp.mean(jnp.square(target - pred))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = nets.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, gnorm

    def train_iter(runner: VDNRunnerState, _) -> tuple:
        key, k_act, k_step, k_sample = jax.random.split(runner.key, 4)
        env_steps = runner.step * cfg.num_envs
        epsilon = linear_schedule(cfg.start_e, cfg.end_e, eps_duration, env_steps)
        q = q_apply(runner.params, runner.obs)
        actions = eps_greedy(k_act, q, runner.avail, epsilon)
        env_state, ts2, final = vec.step(runner.env_state, actions, k_step)
        cut = ts2.done if cfg.bootstrap_truncation else jnp.logical_or(
            ts2.done, ts2.truncated
        )
        transition = Transition(
            obs=runner.obs,
            state=runner.state,
            avail=runner.avail.astype(jnp.bool_),
            action=actions,
            reward=ts2.reward,
            done=cut,
            next_obs=final.obs,
            next_state=final.state,
            next_avail=final.avail.astype(jnp.bool_),
        )
        buffer = runner.buffer.add_batch(transition)
        ended = jnp.logical_or(ts2.done, ts2.truncated)
        stats = runner.stats.step(
            ts2.reward, ended, ts2.info.get("battle_won", jnp.zeros_like(ts2.reward))
        )
        step = runner.step + 1

        can_learn = (step * cfg.num_envs) > cfg.learning_starts
        do_update = jnp.logical_and(can_learn, step % cfg.train_freq == 0)
        params, opt_state, loss, gnorm = jax.lax.cond(
            do_update,
            lambda: update(
                runner.params, runner.target_params, runner.opt_state, buffer, k_sample
            ),
            lambda: (
                runner.params,
                runner.opt_state,
                runner.last_loss,
                runner.last_gnorm,
            ),
        )
        do_polyak = jnp.logical_and(
            can_learn, step % cfg.target_network_update_freq == 0
        )
        target_params = jax.lax.cond(
            do_polyak,
            lambda: nets.soft_update(runner.target_params, params, cfg.polyak),
            lambda: runner.target_params,
        )
        runner = runner.replace(
            params=params,
            target_params=target_params,
            opt_state=opt_state,
            buffer=buffer,
            env_state=env_state,
            obs=ts2.obs,
            state=ts2.state,
            avail=ts2.avail,
            stats=stats,
            step=step,
            last_loss=loss,
            last_gnorm=gnorm,
            num_updates=runner.num_updates + do_update.astype(jnp.int32),
            key=key,
        )
        return runner, epsilon

    @partial(jax.jit, donate_argnums=0)
    def train_block(runner: VDNRunnerState):
        runner, epsilons = jax.lax.scan(
            train_iter, runner, None, length=cfg.log_interval
        )
        metrics = {
            **runner.stats.rollout_metrics(),
            "rollout/epsilon": epsilons[-1],
            "train/loss": runner.last_loss,
            "train/grads": runner.last_gnorm,
            "train/num_updates": runner.num_updates,
        }
        runner = runner.replace(stats=runner.stats.flush())
        return runner, metrics

    def greedy_policy(params, carry, obs, avail, key):
        return carry, masked_argmax(q_apply(params, obs), avail)

    eval_fn = jax.jit(make_evaluator(env, cfg.num_eval_ep, greedy_policy))
    return init, train_block, eval_fn


def train(cfg: VDNConfig, env=None, logger: Logger | None = None):
    from cleanmarl_tpu.core.driver import run_training
    from cleanmarl_tpu.distributed.dp import DATA_FIELD_DIMS

    init, train_block, eval_fn = make_train(cfg, env)
    return run_training(
        "VDN", cfg, init, train_block, eval_fn,
        steps_per_block=cfg.num_envs * cfg.log_interval,
        eval_params=lambda r: r.params,
        steps_of=lambda r: int(r.step) * cfg.num_envs,
        print_keys=("rollout/ep_reward", "train/loss"),
        logger=logger,
        data_field_dims=DATA_FIELD_DIMS["VDN"],
    )


def main():
    from cleanmarl_tpu.core.cli import cli

    train(cli(VDNConfig, description=__doc__))


if __name__ == "__main__":
    main()
