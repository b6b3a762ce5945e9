"""IPPO — Independent PPO (decentralized obs-input critic).

TPU-native rebuild of /root/reference/cleanmarl/ippo.py
(+ ippo_multienvs.py, ippo_jax.py, ippo_jax_multienvs.py). All
machinery lives in ``ppo_common`` (the reference's ippo/mappo pair is
identical code except the critic input, SURVEY.md §2.4); IPPO feeds the
critic each agent's own observation (ippo.py:259).
"""
from __future__ import annotations

from cleanmarl_tpu.algos.ppo_common import PPOConfig, make_train as _make_train, train as _train

IPPOConfig = PPOConfig


def make_train(cfg: PPOConfig, env=None):
    return _make_train(cfg, env, centralized=False, algo_name="IPPO")


def train(cfg: PPOConfig, env=None, logger=None):
    return _train(cfg, env, centralized=False, algo_name="IPPO", logger=logger)


def main():
    from cleanmarl_tpu.core.cli import cli

    train(cli(PPOConfig, description=__doc__))


if __name__ == "__main__":
    main()
