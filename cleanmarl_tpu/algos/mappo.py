"""MAPPO — Multi-Agent PPO with a centralized state-input critic.

TPU-native rebuild of /root/reference/cleanmarl/mappo.py
(+ mappo_multienvs.py, mappo_lstm_multienvs.py — the north-star config,
mappo_jax_multienvs.py). Identical to IPPO except the critic consumes
the global state (mappo.py:258) and its value is broadcast to every
agent (mappo.py:462); see ``ppo_common``.
"""
from __future__ import annotations

from cleanmarl_tpu.algos.ppo_common import PPOConfig, make_train as _make_train, train as _train

MAPPOConfig = PPOConfig


def make_train(cfg: PPOConfig, env=None):
    return _make_train(cfg, env, centralized=True, algo_name="MAPPO")


def train(cfg: PPOConfig, env=None, logger=None):
    return _train(cfg, env, centralized=True, algo_name="MAPPO", logger=logger)


def main():
    from cleanmarl_tpu.core.cli import cli

    train(cli(PPOConfig, description=__doc__))


if __name__ == "__main__":
    main()
