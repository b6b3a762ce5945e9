"""On-device rollout statistics.

The reference accumulates ``ep_reward``/``ep_length`` per episode on the
host and logs means every ``log_every`` episodes
(/root/reference/cleanmarl/vdn.py:283-297, 342-355). Here the running
per-env return/length and the block-level sums live in device registers
inside the scanned train loop; the host reads one tiny dict per logging
interval.
"""
from __future__ import annotations

from typing import Dict

import chex
import jax.numpy as jnp


@chex.dataclass(frozen=True)
class EpisodeStats:
    ep_ret: chex.Array   # (num_envs,) running return of current episode
    ep_len: chex.Array   # (num_envs,)
    ret_sum: chex.Array  # () sum of finished-episode returns this block
    len_sum: chex.Array
    won_sum: chex.Array
    count: chex.Array    # () number of finished episodes this block

    @staticmethod
    def create(num_envs: int) -> "EpisodeStats":
        # distinct buffers per field — aliased leaves break donation
        return EpisodeStats(
            ep_ret=jnp.zeros((num_envs,)),
            ep_len=jnp.zeros((num_envs,)),
            ret_sum=jnp.zeros(()),
            len_sum=jnp.zeros(()),
            won_sum=jnp.zeros(()),
            count=jnp.zeros(()),
        )

    def step(self, reward, ended, won) -> "EpisodeStats":
        """reward/won: (num_envs,) f32, ended: (num_envs,) bool."""
        ep_ret = self.ep_ret + reward
        ep_len = self.ep_len + 1.0
        e = ended.astype(jnp.float32)
        new = self.replace(
            ret_sum=self.ret_sum + jnp.sum(ep_ret * e),
            len_sum=self.len_sum + jnp.sum(ep_len * e),
            won_sum=self.won_sum + jnp.sum(won * e),
            count=self.count + jnp.sum(e),
            ep_ret=ep_ret * (1.0 - e),
            ep_len=ep_len * (1.0 - e),
        )
        return new

    def flush(self) -> "EpisodeStats":
        # distinct buffers per field — aliased leaves break donation
        return self.replace(
            ret_sum=jnp.zeros(()), len_sum=jnp.zeros(()),
            won_sum=jnp.zeros(()), count=jnp.zeros(()),
        )

    def rollout_metrics(self) -> Dict[str, chex.Array]:
        denom = jnp.maximum(self.count, 1.0)
        return {
            "rollout/ep_reward": self.ret_sum / denom,
            "rollout/ep_length": self.len_sum / denom,
            "rollout/battle_won": self.won_sum / denom,
            "rollout/num_episodes": self.count,
        }
