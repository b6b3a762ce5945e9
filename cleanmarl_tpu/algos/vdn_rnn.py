"""Recurrent VDN (GRU Q-net) — CLI wrapper over ``recurrent_q`` with
``mixing="vdn"``. Rebuild of /root/reference/cleanmarl/vdn_lstm.py and
vdn_lstm_jax.py (see recurrent_q.py for the design notes)."""
from __future__ import annotations

from dataclasses import replace

from cleanmarl_tpu.algos.recurrent_q import RecurrentQConfig, make_train, train


def main():
    from cleanmarl_tpu.core.cli import cli

    cfg = cli(RecurrentQConfig, description=__doc__)
    train(replace(cfg, mixing="vdn"))


if __name__ == "__main__":
    main()
