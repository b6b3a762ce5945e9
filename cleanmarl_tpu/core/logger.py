"""Host-side experiment logging: TensorBoard (+ optional W&B) with the
reference's run naming and scalar families.

Mirrors /root/reference/cleanmarl/vdn.py:233-250: run name
``{env_type}__{env_name}__{timestamp}``, writer at
``runs/{ALGO}-{run_name}``, hyperparameters dumped as a markdown table
text scalar, optional wandb with ``sync_tensorboard=True``. Scalars are
written under ``rollout/*``, ``train/*``, ``eval/*`` (vdn.py:331-346,
385-393) so reference dashboards read curves from either framework
unchanged.

The device side hands over one small dict of scalars per logging
interval — a single host transfer, never per-step.
"""
from __future__ import annotations

import dataclasses
import datetime
import os
from typing import Dict, Optional


class Logger:
    def __init__(self, algo: str, args, logdir: str = "runs", use_wnb: bool = False):
        env_type = getattr(args, "env_type", "env")
        env_name = getattr(args, "env_name", "")
        timestamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        self.run_name = f"{env_type}__{env_name}__{timestamp}"
        self.use_wnb = use_wnb
        self._wandb = None
        if use_wnb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(
                    project=getattr(args, "wnb_project", "") or None,
                    entity=getattr(args, "wnb_entity", "") or None,
                    sync_tensorboard=True,
                    config=dataclasses.asdict(args)
                    if dataclasses.is_dataclass(args)
                    else vars(args),
                    name=f"{algo}-{self.run_name}",
                )
            except ImportError:
                self._wandb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(os.path.join(logdir, f"{algo}-{self.run_name}"))
            params = (
                dataclasses.asdict(args)
                if dataclasses.is_dataclass(args)
                else vars(args)
            )
            self.writer.add_text(
                "hyperparameters",
                "|param|value|\n|-|-|\n%s"
                % "\n".join([f"|{k}|{v}|" for k, v in params.items()]),
            )
        except ImportError:  # tensorboard unavailable → JSONL fallback
            self.writer = None
            self._jsonl = open(os.path.join("/tmp", f"{algo}-{self.run_name}.jsonl"), "w")

    def log(self, scalars: Dict[str, float], step: int):
        if self.writer is not None:
            for k, v in scalars.items():
                self.writer.add_scalar(k, float(v), step)
        else:
            import json

            self._jsonl.write(json.dumps({"step": step, **{k: float(v) for k, v in scalars.items()}}) + "\n")

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self._wandb is not None:
            self._wandb.finish()
