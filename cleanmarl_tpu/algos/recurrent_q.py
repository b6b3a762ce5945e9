"""Recurrent value decomposition: GRU Q-nets for VDN and QMIX.

TPU-native rebuild of /root/reference/cleanmarl/vdn_lstm.py,
vdn_lstm_jax.py, qmix_lstm.py and qmix_lstm_jax.py. The reference's
"lstm" files actually use a GRU cell (vdn_lstm.py:88); the net is
fc1→GRU→head (vdn_lstm.py:83-99).

Design differences from the reference, all strictly-simplifying:

- **Full-episode replay by default instead of sequence chunks.**
  vdn_lstm trains on fixed 10-step chunks with an 8-step gradient-free
  burn-in to re-warm the hidden state (vdn_lstm.py:102-183, 394-403)
  because chunks start mid-episode. Episodes here are stored whole
  (padded to ``episode_limit`` with masks), so every hidden state is
  recomputed exactly from t=0 — no burn-in approximation is needed.
  The scanned loss is the dense form of vdn_lstm_jax.py:270-325.
  ``--replay sequence`` switches to the reference's exact storage
  model (buffers/sequence.py chunk ring + zero-start burn-in,
  ``--seq_length/--burn_in``; VDN mixing only, as in the reference).
- **TBPTT as a gradient cut, not chunked optimizer steps.**
  qmix_lstm.py:350-363 backprops+steps every ``tbptt=10`` steps,
  detaching h. ``tbptt=k`` here stops gradients through the carry
  every k steps inside one scan (the stop_gradient carry pattern the
  reference's own JAX port uses, qmix_lstm_jax.py:296-366) with a
  single optimizer step per update.
- Target-network hidden streams are advanced over the observation
  sequence and evaluated one GRU step ahead on the stored next-obs
  (equivalent to the reference's carried (h_target, h_utility) pair,
  vdn_lstm_jax.py:286-325, and exact at terminal steps).

``mixing="vdn"`` sums the per-agent Qs (vdn_lstm); ``mixing="qmix"``
mixes them with the monotonic hypernetwork on the global state
(qmix_lstm). CLI wrappers: ``algos/vdn_rnn.py`` / ``algos/qmix_rnn.py``.
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
from cleanmarl_tpu.buffers.sequence import SequenceAccumulator, SequenceBuffer
from cleanmarl_tpu.core import cadence
from cleanmarl_tpu.core import networks as nets
from cleanmarl_tpu.core.acting import eps_greedy, masked_argmax
from cleanmarl_tpu.core.evaluation import make_evaluator
from cleanmarl_tpu.core.logger import Logger
from cleanmarl_tpu.core.metrics import EpisodeStats
from cleanmarl_tpu.core.optim import make_optimizer
from cleanmarl_tpu.core.rewards import standardize
from cleanmarl_tpu.core.schedules import linear_schedule
from cleanmarl_tpu.envs import registry
from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.envs.external import as_vec


@dataclass
class RecurrentQConfig:
    env_type: str = "matrix"
    env_name: str = ""
    env_family: str = "mpe"
    agent_ids: bool = True
    mixing: str = "vdn"              # "vdn" | "qmix"
    replay: str = "episode"          # "episode" | "sequence" (vdn_lstm.py chunks)
    seq_length: int = 10             # chunk length (vdn_lstm.py:29-30)
    burn_in: int = 8                 # no-grad hidden warmup steps (vdn_lstm.py:31-32)
    normalize_reward: bool = False   # per-sampled-batch standardize (vdn_lstm.py:33)
    bootstrap_truncation: bool = False  # True = the reference's raw-done
    # storage: truncation bootstraps through (infinite-horizon values, a
    # divergence channel on always-truncating envs). False (default) cuts
    # the target at time limits (episodic values).
    num_envs: int = 16
    buffer_size: int = 2000          # episodes (or chunks when replay=sequence)
    total_timesteps: int = 1_000_000
    gamma: float = 0.99
    train_freq: int = 1              # updates every N completed episodes
    optimizer: str = "adam"
    learning_rate: float = 5e-4
    batch_size: int = 10             # episodes per update
    start_e: float = 1.0
    end_e: float = 0.05
    exploration_fraction: float = 0.05
    hidden_dim: int = 64
    hyper_dim: int = 64
    embed_dim: int = 32
    tbptt: int = 0                   # 0 → full BPTT over the episode
    max_updates_per_iter: int = 0    # cap updates per vectorized iteration;
    # surplus carries as debt (core/cadence.py). 0 = uncapped (exact
    # per-crossing semantics; per-iteration cost grows with num_envs)
    compute_dtype: str = "float32"   # "bfloat16": update-path matmuls run
    # with bf16 operands + f32 accumulation (params/carries stay f32)
    gru_impl: str = "auto"           # "pallas": the online sequence
    # recompute in the loss runs the fused Pallas GRU kernel
    # (ops/pallas_gru.py); requires tbptt=0. "auto" (default) picks
    # pallas exactly where it measured faster — TPU backend AND
    # hidden_dim >= 256 (networks.resolve_gru_impl) — else xla.
    target_network_update_freq: int = 1
    polyak: float = 0.01
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
class RecQRunnerState:
    params: Any                  # {"q": rnn, ["mixer": hypernet]}
    target_params: Any
    opt_state: Any
    ring: EpisodeBuffer
    acc: EpisodeAccumulator
    env_state: Any
    obs: chex.Array
    state: chex.Array
    avail: chex.Array
    h: chex.Array                # (num_envs, n_agents, H)
    stats: EpisodeStats
    step: chex.Array
    episodes: chex.Array
    update_debt: chex.Array  # () int32 due-but-deferred updates (cadence.py)
    last_loss: chex.Array
    last_gnorm: chex.Array
    num_updates: chex.Array
    key: chex.PRNGKey


def make_train(cfg: RecurrentQConfig, env=None):
    if cfg.mixing not in ("vdn", "qmix"):
        raise ValueError(f"--mixing must be 'vdn' or 'qmix', got {cfg.mixing!r}")
    if cfg.replay not in ("episode", "sequence"):
        raise ValueError(
            f"--replay must be 'episode' or 'sequence', got {cfg.replay!r}"
        )
    if cfg.replay == "sequence":
        # sequence-chunk replay exists only for VDN in the reference
        # (vdn_lstm.py; qmix_lstm.py uses episode replay + TBPTT)
        if cfg.mixing != "vdn":
            raise ValueError(
                "--replay sequence supports --mixing vdn only: the QMIX "
                "mixer needs whole padded episodes (reference qmix_lstm.py "
                "uses episode replay + TBPTT; sequence chunks are "
                "vdn_lstm.py's storage model)"
            )
        if not 0 <= cfg.burn_in < cfg.seq_length:
            raise ValueError(
                f"--burn_in must satisfy 0 <= burn_in < seq_length, got "
                f"burn_in={cfg.burn_in} seq_length={cfg.seq_length}"
            )
    use_seq = cfg.replay == "sequence"
    if env is None:
        env = registry.make(cfg.env_type, cfg.env_name, agent_ids=cfg.agent_ids,
                            env_family=cfg.env_family)
    vec = as_vec(env, cfg.num_envs)
    opt = make_optimizer(cfg.optimizer, cfg.learning_rate, cfg.clip_gradients)
    eps_duration = cfg.exploration_fraction * cfg.total_timesteps
    t_max = env.episode_limit
    H = cfg.hidden_dim
    use_mixer = cfg.mixing == "qmix"
    if cfg.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"compute_dtype must be float32|bfloat16, "
                         f"got {cfg.compute_dtype!r}")
    mm_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    if cfg.gru_impl not in ("auto", "xla", "pallas"):
        raise ValueError(
            f"gru_impl must be auto|xla|pallas, got {cfg.gru_impl!r}"
        )
    if cfg.gru_impl == "pallas" and cfg.tbptt:
        raise ValueError("gru_impl='pallas' does not support tbptt>0")
    if cfg.gru_impl == "pallas" and mm_dtype is not None:
        raise ValueError(
            "gru_impl='pallas' with compute_dtype='bfloat16' is not "
            "supported (the fused kernel's recurrent matmul is f32)"
        )
    gru_impl = nets.resolve_gru_impl(
        cfg.gru_impl, cfg.hidden_dim, tbptt=cfg.tbptt,
        bf16=mm_dtype is not None,
    )

    def mix(params, agent_qs, state):
        """Team value from per-agent values."""
        if use_mixer:
            return nets.mixer_apply(params["mixer"], agent_qs, state)
        return agent_qs.sum(axis=-1)

    def example_record():
        return {
            "obs": jnp.zeros((env.n_agents, env.obs_dim)),
            "state": jnp.zeros((env.state_dim,)),
            "action": jnp.zeros((env.n_agents,), jnp.int32),
            "reward": jnp.zeros(()),
            "done": jnp.zeros((), jnp.bool_),
            "next_obs": jnp.zeros((env.n_agents, env.obs_dim)),
            "next_state": jnp.zeros((env.state_dim,)),
            "next_avail": jnp.zeros((env.n_agents, env.n_actions), jnp.bool_),
        }

    def init(key: chex.PRNGKey) -> RecQRunnerState:
        kq, km, kreset, key = jax.random.split(key, 4)
        params = {"q": nets.rnn_init(kq, env.obs_dim, H, env.n_actions)}
        if use_mixer:
            params["mixer"] = nets.mixer_init(
                km, env.n_agents, env.state_dim, cfg.embed_dim, cfg.hyper_dim
            )
        env_state, ts = vec.reset(kreset)
        if use_seq:
            ring = SequenceBuffer.create(
                cfg.buffer_size, cfg.seq_length, example_record()
            )
            acc = SequenceAccumulator.create(
                cfg.num_envs, cfg.seq_length, example_record()
            )
        else:
            ring = EpisodeBuffer.create(cfg.buffer_size, t_max, example_record())
            acc = EpisodeAccumulator.create(cfg.num_envs, t_max, example_record())
        return RecQRunnerState(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=opt.init(params),
            ring=ring,
            acc=acc,
            env_state=env_state,
            obs=ts.obs, state=ts.state, avail=ts.avail,
            h=jnp.zeros((cfg.num_envs, env.n_agents, H)),
            stats=EpisodeStats.create(cfg.num_envs),
            step=jnp.zeros((), jnp.int32),
            episodes=jnp.zeros((), jnp.int32),
            update_debt=jnp.zeros((), jnp.int32),
            last_loss=jnp.zeros(()),
            last_gnorm=jnp.zeros(()),
            num_updates=jnp.zeros((), jnp.int32),
            key=key,
        )

    def update_seq(params, target_params, opt_state, ring, key):
        """Chunk-replay update: zero-start hidden + no-grad burn-in over
        the first ``burn_in`` steps, per-step VDN TD loss on the rest
        (vdn_lstm.py:392-436)."""
        batch = ring.sample(key, cfg.batch_size)                # (B, L, ...)
        tm = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), batch)
        reward = tm["reward"]
        if cfg.normalize_reward:
            reward = standardize(reward)                        # vdn_lstm.py:170-174
        B, bi = cfg.batch_size, cfg.burn_in
        h0 = jnp.zeros((B, env.n_agents, H))

        # burn-in: advance target stream on next_obs and online stream
        # on obs, no gradients (vdn_lstm.py:394-403). Input projections
        # are hoisted into batched matmuls (nets.gru_input_proj); only
        # the recurrent projection + gating stay in the scans.
        gi_t_burn = nets.gru_input_proj(
            target_params["q"], tm["next_obs"][:bi], mm_dtype
        )
        gi_u_burn = nets.gru_input_proj(params["q"], tm["obs"][:bi], mm_dtype)

        def burn_body(carry, inp):
            h_t, h_u = carry
            git, giu = inp
            return (
                nets.gru_apply_pre(
                    target_params["q"]["gru"], h_t, git, mm_dtype
                ),
                nets.gru_apply_pre(params["q"]["gru"], h_u, giu, mm_dtype),
            ), None

        (h_t, h_u), _ = jax.lax.scan(burn_body, (h0, h0), (gi_t_burn, gi_u_burn))
        h_t = jax.lax.stop_gradient(h_t)
        h_u = jax.lax.stop_gradient(h_u)

        _, q_next = nets.rnn_seq_apply(
            target_params["q"], h_t, tm["next_obs"][bi:], dtype=mm_dtype,
            impl=gru_impl,
        )
        q_next_max = nets.masked_q(q_next, tm["next_avail"][bi:]).max(axis=-1)
        # (L-bi, B, n)
        done = tm["done"][bi:].astype(jnp.float32)
        target = reward[bi:] + cfg.gamma * (1.0 - done) * q_next_max.sum(axis=-1)
        target = jax.lax.stop_gradient(target)

        def loss_fn(p):
            _, q = nets.rnn_seq_apply(p["q"], h_u, tm["obs"][bi:],
                                      dtype=mm_dtype, impl=gru_impl)
            q_taken = jnp.take_along_axis(
                q, tm["action"][bi:][..., None], axis=-1
            )[..., 0]
            team = q_taken.sum(axis=-1)                         # VDN team value
            return jnp.mean(jnp.square(target - team))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = nets.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, gnorm

    def update(params, target_params, opt_state, ring, key):
        if use_seq:
            return update_seq(params, target_params, opt_state, ring, key)
        batch, mask = ring.sample(key, cfg.batch_size)
        # time-major streams (T, B, ...)
        tm = jax.tree.map(lambda x: jnp.moveaxis(x, 0, 1), batch)
        mask_tm = jnp.moveaxis(mask, 0, 1)                      # (T, B)
        if cfg.normalize_reward:
            tm = {**tm, "reward": standardize(tm["reward"], mask_tm)}
        B = cfg.batch_size
        h0 = jnp.zeros((B, env.n_agents, H))

        # ---- target stream (no grad): advance on obs, evaluate next_obs
        q_next = nets.rnn_seq_eval_next(
            target_params["q"], h0, tm["obs"], tm["next_obs"],
            dtype=mm_dtype,
        )
        q_next_max = nets.masked_q(q_next, tm["next_avail"]).max(axis=-1)
        # (T, B, n)
        team_next = mix(target_params, q_next_max, tm["next_state"])
        done = tm["done"].astype(jnp.float32)
        target = tm["reward"] + cfg.gamma * (1.0 - done) * team_next
        target = jax.lax.stop_gradient(target)

        # ---- online stream --------------------------------------------
        def loss_fn(p):
            _, q = nets.rnn_seq_apply(
                p["q"], h0, tm["obs"], tbptt=cfg.tbptt, dtype=mm_dtype,
                impl=gru_impl,
            )
            q_taken = jnp.take_along_axis(
                q, tm["action"][..., None], axis=-1
            )[..., 0]                                           # (T, B, n)
            team = mix(p, q_taken, tm["state"])                 # (T, B)
            err = jnp.square(target - team) * mask_tm
            return jnp.sum(err) / jnp.maximum(jnp.sum(mask_tm), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = nets.global_norm(grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, gnorm

    def train_iter(runner: RecQRunnerState, _):
        key, k_act, k_step, k_sample = jax.random.split(runner.key, 4)
        env_steps = runner.step * cfg.num_envs
        epsilon = linear_schedule(cfg.start_e, cfg.end_e, eps_duration, env_steps)
        h2, q = nets.rnn_apply(runner.params["q"], runner.h, runner.obs)
        actions = eps_greedy(k_act, q, runner.avail, epsilon)
        env_state, ts2, final = vec.step(runner.env_state, actions, k_step)
        ended = jnp.logical_or(ts2.done, ts2.truncated)
        h2 = jnp.where(ended[:, None, None], 0.0, h2)
        record = {
            "obs": runner.obs,
            "state": runner.state,
            "action": actions,
            "reward": ts2.reward,
            "done": ts2.done if cfg.bootstrap_truncation else ended,
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

        warm = ring.size >= cfg.batch_size
        if use_seq:
            # vdn_lstm trains on an env-step cadence (vdn_lstm.py:383),
            # scaled here by the vectorized env batch
            crossed = jnp.mod(step, jnp.maximum(cfg.train_freq, 1)) == 0
            due = jnp.where(warm & crossed, 1, 0)
        else:
            # one update per train_freq COMPLETED EPISODES; synchronized
            # vectorized envs can finish many episodes in one iteration
            # (MPE: all num_envs truncate together), so run one update
            # per crossing; max_updates_per_iter caps the per-iteration
            # slot count, surplus carried as debt (core/cadence.py)
            due = jnp.where(
                warm,
                episodes // cfg.train_freq
                - runner.episodes // cfg.train_freq,
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
        tau_eff = 1.0 - jnp.power(1.0 - cfg.polyak, due_t.astype(jnp.float32))
        target_params = jax.lax.cond(
            due_t > 0,
            lambda: nets.soft_update(runner.target_params, params, tau_eff),
            lambda: runner.target_params,
        )
        runner = runner.replace(
            params=params, target_params=target_params, opt_state=opt_state,
            ring=ring, acc=acc, env_state=env_state,
            obs=ts2.obs, state=ts2.state, avail=ts2.avail, h=h2,
            stats=stats, step=step, episodes=episodes, update_debt=debt,
            last_loss=loss, last_gnorm=gnorm,
            num_updates=runner.num_updates + n_run,
            key=key,
        )
        return runner, epsilon

    @partial(jax.jit, donate_argnums=0)
    def train_block(runner: RecQRunnerState):
        runner, epsilons = jax.lax.scan(
            train_iter, runner, None, length=cfg.log_interval
        )
        metrics = {
            **runner.stats.rollout_metrics(),
            "rollout/epsilon": epsilons[-1],
            "train/loss": runner.last_loss,
            "train/grads": runner.last_gnorm,
            "train/num_updates": runner.num_updates,
            # nonzero = capped cadence deferring updates (core/cadence.py)
            "train/update_debt": runner.update_debt,
        }
        return runner.replace(stats=runner.stats.flush()), metrics

    def greedy_policy(params, carry, obs, avail, key):
        h2, q = nets.rnn_apply(params["q"], carry, obs)
        return h2, masked_argmax(q, avail)

    eval_fn = jax.jit(
        make_evaluator(
            env, cfg.num_eval_ep, greedy_policy,
            init_carry=lambda m: jnp.zeros((m, env.n_agents, H)),
        )
    )
    return init, train_block, eval_fn


def train(cfg: RecurrentQConfig, env=None, logger: Logger | None = None):
    from cleanmarl_tpu.core.driver import run_training
    from cleanmarl_tpu.distributed.dp import DATA_FIELD_DIMS

    algo_name = "VDN-RNN" if cfg.mixing == "vdn" else "QMIX-RNN"
    init, train_block, eval_fn = make_train(cfg, env)
    return run_training(
        algo_name, cfg, init, train_block, eval_fn,
        steps_per_block=cfg.num_envs * cfg.log_interval,
        eval_params=lambda r: r.params,
        steps_of=lambda r: int(r.step) * cfg.num_envs,
        print_keys=("rollout/ep_reward", "train/loss"),
        logger=logger,
        data_field_dims=DATA_FIELD_DIMS["RECURRENT_Q"],
    )


def main():
    from cleanmarl_tpu.core.cli import cli

    train(cli(RecurrentQConfig, description=__doc__))


if __name__ == "__main__":
    main()
