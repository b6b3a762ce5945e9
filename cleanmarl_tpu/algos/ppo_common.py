"""Shared IPPO/MAPPO machinery (clipped PPO + TD(λ) on rollout streams),
feed-forward and recurrent.

TPU-native rebuild of /root/reference/cleanmarl/ippo.py and mappo.py
(which are byte-for-byte identical except for the critic input —
obs for IPPO ippo.py:259, global state for MAPPO mappo.py:258 with the
value broadcast to agents mappo.py:462; SURVEY.md §2.4), plus their
``_lstm`` variants (GRU actor + feed-forward critic,
ippo_lstm.py:161-183, mappo_lstm_multienvs.py — the north-star config):

- The reference collects exactly ``batch_size`` complete episodes via
  Python env loops / Pipe workers and pads them. Here a fixed-length
  rollout (default = episode_limit) is collected from ``num_envs``
  auto-reset on-device envs by ``lax.scan``; λ-returns are computed
  over the stream with episode boundaries from the ended flags
  (ops/returns.py), which is exactly the reference's per-episode
  recursion when rollouts align with episodes and the standard
  bootstrapped-tail extension when an episode is cut mid-rollout.
- PPO loss follows ippo.py:429-484: ratio from stored behaviour
  log-probs, clip, entropy bonus, full-batch epochs (3, no
  minibatching — ``num_minibatches=1`` default; k>1 splits the env
  axis per epoch, which is what bounds grad-path HBM at large env
  batches), value MSE vs the λ-return, KL (k3 estimator
  (ratio−1)−log ratio) + clip-fraction diagnostics, separate actor
  and critic optimizers (ippo.py:263-265).
- Truncation is NOT bootstrapped (next_value = 0 at the terminal step
  of every episode, ippo.py:399-401) — reproduced by folding
  ``truncated`` into the ``ended`` flags.
- ``recurrent=True`` swaps the actor for the fc1→GRU→head core
  (vdn_lstm.py:83-99 architecture); the hidden state is carried across
  rollout blocks, zeroed at episode boundaries, and the update re-runs
  the GRU over the whole rollout in a scan (full BPTT). ``tbptt=k``
  stops gradients through the carry every k steps — the scan-native
  form of the reference's chunked TBPTT with inner optimizer steps
  (mappo_lstm_multienvs.py:562-620); the per-chunk optimizer steps are
  intentionally collapsed into one (a modernization, not a port).
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
from cleanmarl_tpu.envs import registry
from cleanmarl_tpu.envs.base import VecEnv
from cleanmarl_tpu.envs.external import as_vec
from cleanmarl_tpu.core.rewards import standardize
from cleanmarl_tpu.ops.returns import lambda_advantages


@dataclass
class PPOConfig:
    # defaults follow ippo.py:17-76 / mappo.py
    env_type: str = "matrix"
    env_name: str = ""
    env_family: str = "mpe"
    agent_ids: bool = True
    num_envs: int = 16              # parallel on-device envs
    rollout_len: int = 0            # 0 → env.episode_limit
    recurrent: bool = False         # GRU actor (the _lstm variants)
    tbptt: int = 0                  # 0 → full BPTT through the rollout
    actor_hidden_dim: int = 32
    actor_num_layers: int = 1
    critic_hidden_dim: int = 32
    critic_num_layers: int = 1
    optimizer: str = "adam"
    learning_rate_actor: float = 8e-4
    learning_rate_critic: float = 8e-4
    total_timesteps: int = 1_000_000
    gamma: float = 0.99
    td_lambda: float = 0.95
    normalize_reward: bool = False   # standardize rollout rewards (ippo.py:49)
    normalize_advantage: bool = False
    normalize_return: bool = False   # standardize critic targets (ippo.py:416-419)
    ppo_clip: float = 0.2
    entropy_coef: float = 0.001
    anneal_entropy: bool = False     # linear entropy-coef decay to 0 over the run
    epochs: int = 3
    num_minibatches: int = 1        # >1: split the env axis per epoch.
    # The reference trains full-batch (ippo.py:429-484 — 3 epochs, no
    # minibatching); 1 reproduces that. k>1 is standard PPO minibatching
    # over the env axis: grad-path memory scales with num_envs/k, which
    # is what lets the hidden-128 recipe run at 8192 envs on one v5e.
    remat_actor: bool = False       # jax.checkpoint the actor sequence
    # recompute (recurrent grad path) — trades ~1 extra forward scan for
    # not materializing the per-step GRU residuals of the whole rollout.
    gru_impl: str = "auto"          # "pallas": the actor's training-time
    # sequence recompute runs the fused Pallas GRU kernel — the whole
    # time loop in one kernel per batch tile, hidden state resident in
    # VMEM (ops/pallas_gru.py). Profile-driven: the scan path spends
    # ~89% of the north-star block in ~10µs per-step fusions.
    # "auto" (default) picks pallas exactly where it measured faster —
    # TPU backend AND actor_hidden_dim >= 256 (r4 sweep: +9% steps/s,
    # −32% HBM at 256; parity at 128) — else xla. See
    # networks.resolve_gru_impl.
    compute_dtype: str = "float32"  # "bfloat16" runs the UPDATE-path
    # matmuls (actor sequence recompute + critic) with bf16 operands and
    # f32 accumulation — params, carries, activations and the rollout
    # stay f32. The behaviour logp is computed in f32 at rollout time,
    # so epoch-0 ratios deviate from 1 by the bf16 rounding of the
    # recomputed logits; PPO's clip absorbs this (validated on the
    # north-star recipe — see validation/mappo_rnn_3m_bf16.jsonl).
    anneal_lr: bool = False          # linear LR decay to 0 over the run
    death_masking: bool = False     # exclude dead-agent timesteps from the
    # actor/critic losses and the advantage-normalization statistics. An
    # agent is dead when its avail row allows ONLY the no-op (SMAClite
    # marks dead agents exactly that way, envs/smaclite.py) — the
    # standard MAPPO hard-map lever (Yu et al. 2022 §5.2); the reference
    # has no equivalent (PARITY.md §4b deviation, off by default).
    normalize_values: bool = False  # running-stat value normalization:
    # the critic trains on standardized targets while GAE/bootstrap use
    # the de-normalized outputs (MAPPO-paper value norm). Keeps the
    # critic's regression target O(1) as returns grow on hard maps.
    # Mutually exclusive with normalize_return (which standardizes
    # per-batch instead of with running stats).
    clip_gradients: float = -1.0
    log_interval: int = 8           # rollouts per host log
    eval_steps: int = 50_000        # env transitions between evals
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
class PPORunnerState:
    actor_params: Any
    critic_params: Any
    actor_opt: Any
    critic_opt: Any
    env_state: Any
    obs: chex.Array
    state: chex.Array
    avail: chex.Array
    actor_h: chex.Array   # (num_envs, n_agents, H); zeros when FF
    stats: EpisodeStats
    step: chex.Array      # () int32 — env transitions so far
    num_updates: chex.Array
    vnorm: Any            # value-normalizer running stats (mean/var/count
                          # scalars; inert unless cfg.normalize_values)
    key: chex.PRNGKey


def alive_mask(avail):
    """1.0 where the agent is alive: any action besides the no-op is
    available, or the no-op itself is unavailable. Dead SMAClite agents
    expose exactly {no-op}; envs without a death mechanic keep ≥2
    actions available and mask nothing."""
    a = avail.astype(jnp.float32)
    return jnp.where((a.sum(-1) > 1.0) | (a[..., 0] == 0.0), 1.0, 0.0)


def wmean(x, w):
    """Weighted mean over all elements; ``w=None`` → plain mean."""
    if w is None:
        return x.mean()
    return (x * w).sum() / jnp.maximum(w.sum(), 1.0)


def wstandardize(x, w):
    """(x − μ)/σ with optionally-weighted statistics."""
    m = wmean(x, w)
    var = wmean(jnp.square(x - m), w)
    return (x - m) / (jnp.sqrt(var) + 1e-8)


def vnorm_init():
    return dict(mean=jnp.zeros(()), var=jnp.ones(()),
                count=jnp.full((), 1e-4))


def vnorm_update(vn, batch, w=None):
    """Welford merge of one returns batch into the running stats."""
    bm = wmean(batch, w)
    bv = wmean(jnp.square(batch - bm), w)
    bc = float(batch.size) if w is None else jnp.maximum(w.sum(), 1.0)
    tot = vn["count"] + bc
    delta = bm - vn["mean"]
    mean = vn["mean"] + delta * bc / tot
    m2 = (vn["var"] * vn["count"] + bv * bc
          + jnp.square(delta) * vn["count"] * bc / tot)
    return dict(mean=mean, var=m2 / tot, count=tot)


def masked_logits(actor_params, obs, avail):
    return nets.masked_q(nets.mlp_apply(actor_params, obs), avail)


def make_train(cfg: PPOConfig, env=None, centralized: bool = False,
               algo_name: str = "IPPO"):
    if env is None:
        env = registry.make(cfg.env_type, cfg.env_name, agent_ids=cfg.agent_ids,
                            env_family=cfg.env_family)
    vec = as_vec(env, cfg.num_envs)
    rollout_len = cfg.rollout_len or env.episode_limit
    n_mb = max(1, cfg.num_minibatches)
    if cfg.num_envs % n_mb:
        raise ValueError(
            f"num_envs={cfg.num_envs} not divisible by "
            f"num_minibatches={n_mb}"
        )
    total_updates = cfg.epochs * n_mb * max(
        cfg.total_timesteps // (rollout_len * cfg.num_envs), 1
    )
    n_updates = total_updates if cfg.anneal_lr else 0
    actor_opt = make_optimizer(
        cfg.optimizer, cfg.learning_rate_actor, cfg.clip_gradients, n_updates
    )
    critic_opt = make_optimizer(
        cfg.optimizer, cfg.learning_rate_critic, cfg.clip_gradients, n_updates
    )
    critic_in = env.state_dim if centralized else env.obs_dim
    H = cfg.actor_hidden_dim
    if cfg.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"compute_dtype must be float32|bfloat16, "
                         f"got {cfg.compute_dtype!r}")
    if cfg.gru_impl not in ("auto", "xla", "pallas"):
        raise ValueError(
            f"gru_impl must be auto|xla|pallas, got {cfg.gru_impl!r}"
        )
    if cfg.gru_impl == "pallas" and cfg.tbptt:
        raise ValueError("gru_impl='pallas' does not support tbptt>0")
    if cfg.normalize_values and cfg.normalize_return:
        raise ValueError(
            "normalize_values (running-stat) and normalize_return "
            "(per-batch) are mutually exclusive critic-target transforms"
        )
    mm_dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    if cfg.gru_impl == "pallas" and mm_dtype is not None:
        raise ValueError(
            "gru_impl='pallas' with compute_dtype='bfloat16' is not "
            "supported (the fused kernel's recurrent matmul is f32)"
        )
    gru_impl = nets.resolve_gru_impl(
        cfg.gru_impl, H, tbptt=cfg.tbptt, bf16=mm_dtype is not None
    )

    def actor_step(actor_params, h, obs, avail):
        """One actor forward. → (h', masked logits)."""
        if cfg.recurrent:
            h2, logits = nets.rnn_apply(actor_params, h, obs)
            return h2, nets.masked_q(logits, avail)
        return h, masked_logits(actor_params, obs, avail)

    def actor_logits_seq(actor_params, h0, obs_seq, avail_seq, ended_seq):
        """Recompute logits over a (T, B, n, ·) stream, resetting the
        GRU carry at episode boundaries; tbptt>0 cuts gradients through
        the carry every tbptt steps."""
        if not cfg.recurrent:
            return nets.masked_q(
                nets.mlp_apply(actor_params, obs_seq, dtype=mm_dtype),
                avail_seq,
            )
        # input projection + head hoisted out of the sequential scan
        # (nets.rnn_seq_apply); numerics identical to the per-step form
        _, logits = nets.rnn_seq_apply(
            actor_params, h0, obs_seq, reset_seq=ended_seq, tbptt=cfg.tbptt,
            dtype=mm_dtype, impl=gru_impl,
        )
        return nets.masked_q(logits, avail_seq)

    def critic_values(critic_params, batch_obs, batch_state, dtype=None):
        """→ values broadcast per agent (..., n_agents)."""
        if centralized:
            v = nets.mlp_apply(
                critic_params, batch_state, dtype=dtype
            )[..., 0]                                                # (...,)
            return jnp.broadcast_to(
                v[..., None], v.shape + (env.n_agents,)
            )
        return nets.mlp_apply(
            critic_params, batch_obs, dtype=dtype
        )[..., 0]                                                    # (..., n)

    def init(key: chex.PRNGKey) -> PPORunnerState:
        ka, kc, kreset, key = jax.random.split(key, 4)
        if cfg.recurrent:
            actor_params = nets.rnn_init(
                ka, env.obs_dim, H, env.n_actions, final_gain=0.01
            )
        else:
            actor_params = nets.mlp_init(
                ka, env.obs_dim, H, env.n_actions,
                cfg.actor_num_layers, final_gain=0.01,
            )
        critic_params = nets.mlp_init(
            kc, critic_in, cfg.critic_hidden_dim, 1, cfg.critic_num_layers
        )
        env_state, ts = vec.reset(kreset)
        return PPORunnerState(
            actor_params=actor_params,
            critic_params=critic_params,
            actor_opt=actor_opt.init(actor_params),
            critic_opt=critic_opt.init(critic_params),
            env_state=env_state,
            obs=ts.obs,
            state=ts.state,
            avail=ts.avail,
            actor_h=jnp.zeros((cfg.num_envs, env.n_agents, H)),
            stats=EpisodeStats.create(cfg.num_envs),
            step=jnp.zeros((), jnp.int32),
            num_updates=jnp.zeros(()),
            vnorm=vnorm_init(),
            key=key,
        )

    # ------------------------------------------------------------------
    def collect_rollout(runner: PPORunnerState):
        def step_fn(carry, _):
            env_state, obs, state, avail, h, stats, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            h2, logits = actor_step(runner.actor_params, h, obs, avail)
            # one key, batched sampling over (env, agent) — categorical
            # draws independent samples over leading dims natively
            actions = jax.random.categorical(k_act, logits).astype(jnp.int32)
            logp = jnp.take_along_axis(
                jax.nn.log_softmax(logits, axis=-1), actions[..., None], axis=-1
            )[..., 0]
            env_state, ts2, final = vec.step(env_state, actions, k_step)
            ended = jnp.logical_or(ts2.done, ts2.truncated)
            h2 = jnp.where(ended[:, None, None], 0.0, h2)
            stats = stats.step(
                ts2.reward, ended,
                ts2.info.get("battle_won", jnp.zeros_like(ts2.reward)),
            )
            out = {
                "obs": obs, "state": state, "avail": avail,
                "action": actions, "logp": logp,
                "reward": ts2.reward, "ended": ended,
            }
            return (env_state, ts2.obs, ts2.state, ts2.avail, h2, stats, key), out

        key, scan_key = jax.random.split(runner.key)
        h0 = runner.actor_h
        carry0 = (
            runner.env_state, runner.obs, runner.state, runner.avail,
            h0, runner.stats, scan_key,
        )
        carry, traj = jax.lax.scan(step_fn, carry0, None, length=rollout_len)
        env_state, obs, state, avail, h, stats, _ = carry
        runner = runner.replace(
            env_state=env_state, obs=obs, state=state, avail=avail,
            actor_h=h, stats=stats, key=key,
            step=runner.step + rollout_len * cfg.num_envs,
        )
        return runner, traj, h0

    # ------------------------------------------------------------------
    def ppo_update(runner: PPORunnerState, traj, h0):
        # dead-agent weights from the stored avail rows (death_masking)
        alive = alive_mask(traj["avail"]) if cfg.death_masking else None
        # advantages with the pre-update critic (ippo.py:394-411)
        values = critic_values(runner.critic_params, traj["obs"], traj["state"])
        vboot = critic_values(
            runner.critic_params, runner.obs, runner.state
        )  # V(o_T) of the live (post-rollout) obs
        if cfg.normalize_values:
            # the critic regresses in normalized space; GAE and the
            # bootstrap consume de-normalized values
            sigma = jnp.sqrt(runner.vnorm["var"]) + 1e-8
            values = values * sigma + runner.vnorm["mean"]
            vboot = vboot * sigma + runner.vnorm["mean"]
        team_reward = traj["reward"]
        if cfg.normalize_reward:
            # per-batch standardization at sample time (ippo.py buffer,
            # mappo.py:142-145)
            team_reward = standardize(team_reward)
        reward = jnp.broadcast_to(
            team_reward[..., None], values.shape
        )
        ended = jnp.broadcast_to(traj["ended"][..., None], values.shape)
        returns, adv = lambda_advantages(
            reward, ended, values, vboot, cfg.gamma, cfg.td_lambda
        )
        returns = jax.lax.stop_gradient(returns)
        adv = jax.lax.stop_gradient(adv)
        if cfg.normalize_advantage:
            adv = wstandardize(adv, alive)
        if cfg.normalize_return:
            # advantages keep the raw returns; only the critic target is
            # standardized, agent-mean convention (mappo.py:416-419)
            ret_am = returns.mean(axis=-1)
            returns = (returns - ret_am.mean()) / (ret_am.std() + 1e-8)
        vnorm = runner.vnorm
        if cfg.normalize_values:
            # fold this rollout's returns into the running stats, then
            # regress the critic on the freshly-normalized target
            vnorm = vnorm_update(vnorm, returns, alive)
            returns = (returns - vnorm["mean"]) / (
                jnp.sqrt(vnorm["var"]) + 1e-8
            )

        # entropy-coef schedule: sharpens the late policy so the sampled
        # eval converges toward the greedy one (an option the reference
        # lacks; off by default — no behavior change unless enabled)
        ent_coef = cfg.entropy_coef
        if cfg.anneal_entropy:
            ent_coef = cfg.entropy_coef * jnp.clip(
                1.0 - runner.num_updates / total_updates, 0.0, 1.0
            )

        logits_seq = actor_logits_seq
        if cfg.remat_actor:
            # recompute the whole sequence forward in the backward pass
            # instead of materializing its residuals (per-step GRU gates,
            # hoisted (T,B,n,3H) input projections) across the epoch scan
            logits_seq = jax.checkpoint(
                actor_logits_seq,
                policy=jax.checkpoint_policies.nothing_saveable,
            )

        def actor_loss_fn(actor_params, mb):
            w = mb.get("alive")
            logits = logits_seq(
                actor_params, mb["h0"], mb["obs"], mb["avail"], mb["ended"]
            )
            logp_all = jax.nn.log_softmax(logits, axis=-1)
            logp = jnp.take_along_axis(
                logp_all, mb["action"][..., None], axis=-1
            )[..., 0]
            log_ratio = logp - mb["logp"]
            ratio = jnp.exp(log_ratio)
            pg1 = mb["adv"] * ratio
            pg2 = mb["adv"] * jnp.clip(
                ratio, 1.0 - cfg.ppo_clip, 1.0 + cfg.ppo_clip
            )
            pg = wmean(jnp.minimum(pg1, pg2), w)
            p = jnp.exp(logp_all)
            entropy = wmean(-jnp.sum(p * logp_all, axis=-1), w)
            loss = -pg - ent_coef * entropy
            kl = wmean((ratio - 1.0) - log_ratio, w)
            clipped = wmean(
                (jnp.abs(ratio - 1.0) > cfg.ppo_clip).astype(jnp.float32), w
            )
            return loss, (entropy, kl, clipped)

        def critic_loss_fn(critic_params, mb):
            v = critic_values(
                critic_params, mb["obs"], mb["state"], dtype=mm_dtype
            )
            return wmean(jnp.square(v - mb["returns"]), mb.get("alive"))

        full = {
            **{k: traj[k] for k in
               ("obs", "state", "avail", "action", "logp", "ended")},
            "adv": adv, "returns": returns,
        }
        if cfg.death_masking:
            full["alive"] = alive

        def minibatch_step(carry, mb):
            a_params, c_params, a_opt, c_opt = carry
            (a_loss, (entropy, kl, clipped)), a_grads = jax.value_and_grad(
                actor_loss_fn, has_aux=True
            )(a_params, mb)
            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(c_params, mb)
            a_gnorm = nets.global_norm(a_grads)
            c_gnorm = nets.global_norm(c_grads)
            a_updates, a_opt = actor_opt.update(a_grads, a_opt, a_params)
            a_params = optax.apply_updates(a_params, a_updates)
            c_updates, c_opt = critic_opt.update(c_grads, c_opt, c_params)
            c_params = optax.apply_updates(c_params, c_updates)
            m = {
                "train/actor_loss": a_loss,
                "train/critic_loss": c_loss,
                "train/entropy": entropy,
                "train/kl_divergence": kl,
                "train/clipped_ratios": clipped,
                "train/actor_gradients": a_gnorm,
                "train/critic_gradients": c_gnorm,
            }
            return (a_params, c_params, a_opt, c_opt), m

        mb_size = cfg.num_envs // n_mb

        def epoch(carry, _):
            if n_mb == 1:
                carry, m = minibatch_step(carry, {**full, "h0": h0})
                return carry, m

            def mb_body(c, i):
                # contiguous env-axis slice i — no shuffling: the envs are
                # iid parallel instances, so a fixed partition is already
                # an unbiased minibatch and avoids a full-trajectory gather
                mb = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, i * mb_size, mb_size, axis=1
                    ),
                    full,
                )
                mb["h0"] = jax.lax.dynamic_slice_in_dim(
                    h0, i * mb_size, mb_size, axis=0
                )
                return minibatch_step(c, mb)

            carry, ms_mb = jax.lax.scan(mb_body, carry, jnp.arange(n_mb))
            return carry, jax.tree.map(jnp.mean, ms_mb)

        carry0 = (
            runner.actor_params, runner.critic_params,
            runner.actor_opt, runner.critic_opt,
        )
        (a_params, c_params, a_opt, c_opt), ms = jax.lax.scan(
            epoch, carry0, None, length=cfg.epochs
        )
        metrics = jax.tree.map(jnp.mean, ms)
        if cfg.normalize_values:
            metrics["train/value_norm_mean"] = vnorm["mean"]
            metrics["train/value_norm_std"] = jnp.sqrt(vnorm["var"])
        runner = runner.replace(
            actor_params=a_params, critic_params=c_params,
            actor_opt=a_opt, critic_opt=c_opt,
            num_updates=runner.num_updates + cfg.epochs * n_mb,
            vnorm=vnorm,
        )
        return runner, metrics

    # ------------------------------------------------------------------
    def rollout_and_update(runner, _):
        runner, traj, h0 = collect_rollout(runner)
        runner, metrics = ppo_update(runner, traj, h0)
        return runner, metrics

    @partial(jax.jit, donate_argnums=0)
    def train_block(runner: PPORunnerState):
        runner, ms = jax.lax.scan(
            rollout_and_update, runner, None, length=cfg.log_interval
        )
        metrics = {
            **runner.stats.rollout_metrics(),
            **{k: v[-1] for k, v in ms.items()},
            "train/num_updates": runner.num_updates,
        }
        return runner.replace(stats=runner.stats.flush()), metrics

    def phase_timer(runner, iters: int = 3):
        """Per-phase wall time (rollout vs PPO update), measured on
        separately-jitted phases — SURVEY §5.1. The production block
        fuses both into one XLA program; this is the diagnostic split."""
        rollout_jit = jax.jit(collect_rollout)
        update_jit = jax.jit(ppo_update)
        out = rollout_jit(runner)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(rollout_jit(runner))
        rollout_s = (time.perf_counter() - t0) / iters
        r2, traj, h0 = rollout_jit(runner)
        jax.block_until_ready(update_jit(r2, traj, h0))
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(update_jit(r2, traj, h0))
        update_s = (time.perf_counter() - t0) / iters
        return {
            "perf/rollout_s": rollout_s,
            "perf/update_s": update_s,
            "perf/rollout_frac": rollout_s / max(rollout_s + update_s, 1e-9),
        }

    def sampled_policy(params, carry, obs, avail, key):
        carry, logits = actor_step(params, carry, obs, avail)
        return carry, jax.random.categorical(key, logits).astype(jnp.int32)

    eval_fn = jax.jit(
        make_evaluator(
            env, cfg.num_eval_ep, sampled_policy,
            init_carry=lambda m: jnp.zeros((m, env.n_agents, H)),
        )
    )
    # analytic model-FLOPs per env transition (matmul MACs ×2). XLA's
    # compiled cost_analysis counts each lax.scan body ONCE rather than
    # ×length, so it undercounts scanned training loops ~(T·epochs)× —
    # bench MFU uses this count instead. Backward pass ≈ 2× forward.
    # env.obs_dim here is the WRAPPED width: with cfg.agent_ids the
    # registry's AgentIDWrapper has already added n_agents to obs_dim
    # (envs/wrappers.py:19), so this is the true fc1 input width.
    # Bias adds and GRU gating elementwise FLOPs are excluded by design
    # (matmul-MACs-only transparency metric).
    macs_actor = (
        env.obs_dim * H + H * 3 * H + H * 3 * H + H * env.n_actions
        if cfg.recurrent else
        env.obs_dim * H + cfg.actor_num_layers * H * H + H * env.n_actions
    )
    Hc = cfg.critic_hidden_dim
    macs_critic = critic_in * Hc + cfg.critic_num_layers * Hc * Hc + Hc
    # decentralized (IPPO) evaluates the critic per agent; the bootstrap
    # V(o_T) runs once per ROLLOUT, i.e. 1/rollout_len per env step
    n_critic = 1 if centralized else env.n_agents
    critic_evals = 1 + 1.0 / rollout_len + 3 * cfg.epochs
    per_step_macs = (
        env.n_agents * macs_actor * (1 + 3 * cfg.epochs)   # act + recompute
        + n_critic * macs_critic * critic_evals            # adv+boot+loss
    )
    meta = {
        "rollout_len": rollout_len,
        "steps_per_block": rollout_len * cfg.num_envs * cfg.log_interval,
        "algo_name": algo_name,
        "phase_timer": phase_timer,
        "model_flops_per_step": 2.0 * per_step_macs,
    }
    return init, train_block, eval_fn, meta


def train(cfg: PPOConfig, env=None, centralized: bool = False,
          algo_name: str = "IPPO", logger: Logger | None = None):
    from cleanmarl_tpu.core.driver import run_training
    from cleanmarl_tpu.distributed.dp import DATA_FIELD_DIMS

    init, train_block, eval_fn, meta = make_train(cfg, env, centralized, algo_name)
    return run_training(
        algo_name, cfg, init, train_block, eval_fn,
        steps_per_block=meta["steps_per_block"],
        eval_params=lambda r: r.actor_params,
        print_keys=("rollout/ep_reward", "train/actor_loss"),
        logger=logger,
        data_field_dims=DATA_FIELD_DIMS["PPO"],
        phase_timer=meta["phase_timer"],
    )
