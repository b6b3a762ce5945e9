"""Shared host-side training driver.

Every algorithm's device side exposes (init, train_block, eval_fn);
this driver owns the Python loop around them: block execution, metric
logging (TB/W&B with the reference's scalar names), periodic jitted
evaluation, console progress, and orbax checkpoint/resume (absent from
the reference — README.md:56 to-do).

One host transfer per block; everything else stays on device.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax

from cleanmarl_tpu.core.logger import Logger


class _NullLogger:
    """Non-main multi-host processes log nothing (process 0 owns TB/W&B)."""

    def log(self, scalars, step):
        pass

    def close(self):
        pass


def run_training(
    algo_name: str,
    cfg: Any,
    init: Callable,
    train_block: Callable,
    eval_fn: Callable,
    steps_per_block: int,
    eval_params: Callable[[Any], Any],
    steps_of: Optional[Callable[[Any], int]] = None,
    print_keys: Tuple[str, ...] = ("rollout/ep_reward",),
    logger: Optional[Logger] = None,
    data_field_dims: Optional[Dict[str, int]] = None,
    phase_timer: Optional[Callable[[Any], Dict[str, float]]] = None,
) -> Tuple[Any, Dict[str, float]]:
    """Returns (final runner, last eval metrics).

    Config knobs read here (all optional on cfg): ``total_timesteps``,
    ``eval_steps``, ``seed``, ``verbose``, ``checkpoint_dir`` (enables
    checkpointing), ``checkpoint_every`` (env steps between saves),
    ``resume`` (restore the latest checkpoint before training),
    ``use_mesh`` (shard the env batch over every visible device —
    implied by multi-host mode, distributed/multihost.py).
    """
    is_main = jax.process_index() == 0
    own_logger = logger is None
    if own_logger:
        logger = (
            Logger(algo_name, cfg, use_wnb=getattr(cfg, "use_wnb", False))
            if is_main else _NullLogger()
        )
    verbose = getattr(cfg, "verbose", False) and is_main
    key = jax.random.PRNGKey(cfg.seed)
    init_key, eval_key = jax.random.split(key)

    use_mesh = (
        getattr(cfg, "use_mesh", False) or jax.process_count() > 1
    ) and data_field_dims is not None and jax.device_count() > 1
    if use_mesh:
        from cleanmarl_tpu.distributed.dp import global_runner_init, make_mesh

        mesh = make_mesh()
        # one global program materializes the runner in its production
        # shardings: env batch over `data`, params replicated
        runner = global_runner_init(init, init_key, mesh, data_field_dims)
    else:
        runner = init(init_key)
    if steps_of is None:
        steps_of = lambda r: int(r.step)  # noqa: E731

    ckpt = None
    done_steps = 0
    ckpt_dir = getattr(cfg, "checkpoint_dir", "")
    # Multi-host: every process participates in each save/restore (orbax
    # writes the shards a process owns and barriers across the cluster);
    # checkpoint_dir must point at storage all hosts share — a network
    # filesystem or object store (MULTIHOST.md). Localhost multi-process
    # (the test cluster) trivially satisfies this.
    if ckpt_dir:
        from cleanmarl_tpu.core.checkpoint import Checkpointer

        ckpt = Checkpointer(ckpt_dir)
        if getattr(cfg, "resume", False) and ckpt.latest_step() is not None:
            runner = ckpt.restore(runner)
            done_steps = steps_of(runner)
            if is_main:
                print(
                    f"[{algo_name}] resumed from step {ckpt.latest_step()}",
                    flush=True,
                )

    # a resumed run trains only the REMAINING budget, so interrupt+resume
    # completes exactly total_timesteps overall
    remaining = max(0, cfg.total_timesteps - done_steps)
    num_blocks = remaining // steps_per_block if done_steps else max(
        1, cfg.total_timesteps // steps_per_block
    )
    eval_every = max(1, cfg.eval_steps // steps_per_block)
    ckpt_every = max(
        1, getattr(cfg, "checkpoint_every", 0) // steps_per_block
    ) if ckpt_dir else 0
    eval_metrics: Dict[str, float] = {}
    profile_dir = getattr(cfg, "profile_dir", "")
    t0 = time.time()
    steps0 = None
    for block in range(num_blocks):
        if profile_dir and block == 1:
            # block 0 paid compilation; trace one steady-state block
            # (viewable in TensorBoard's profile plugin)
            with jax.profiler.trace(profile_dir):
                runner, metrics = train_block(runner)
                jax.block_until_ready(metrics)
            if phase_timer is not None:
                phases = {k: float(v) for k, v in phase_timer(runner).items()}
                logger.log(phases, steps_of(runner))
                if verbose:
                    print(f"[{algo_name}] phases: {phases}", flush=True)
        else:
            runner, metrics = train_block(runner)
        env_steps = steps_of(runner)
        if steps0 is None:
            steps0 = env_steps - steps_per_block
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["perf/env_steps_per_s"] = (env_steps - steps0) / max(
            time.time() - t0, 1e-9
        )
        logger.log(metrics, env_steps)
        if verbose:
            parts = [f"[{algo_name}] step={env_steps}"]
            for k in print_keys:
                if k in metrics:
                    parts.append(f"{k.split('/')[-1]}={metrics[k]:.3f}")
            parts.append(f"sps={metrics['perf/env_steps_per_s']:,.0f}")
            print(" ".join(parts), flush=True)
        if (block + 1) % eval_every == 0:
            eval_key, k = jax.random.split(eval_key)
            eval_metrics = {
                k2: float(v) for k2, v in eval_fn(eval_params(runner), k).items()
            }
            logger.log(eval_metrics, env_steps)
        if ckpt is not None and ckpt_every and (block + 1) % ckpt_every == 0:
            ckpt.save(env_steps, runner)
    if ckpt is not None:
        ckpt.save(int(cfg.total_timesteps), runner, wait=True)
        ckpt.close()
    if own_logger:
        logger.close()
    return runner, eval_metrics
