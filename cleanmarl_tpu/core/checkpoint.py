"""Orbax checkpoint/resume for full runner states.

The reference has NO checkpointing — "Save the weights" is an open
to-do (/root/reference/README.md:56); nothing in the repo writes model
state (SURVEY.md §5.4). This module checkpoints the ENTIRE runner
pytree — params, target params, optimizer state, replay buffers, env
states, RNG keys, step counters — so a run resumes bit-exactly where it
stopped, which is strictly stronger than weights-only saving.

Multi-host: works unchanged under ``jax.distributed`` — EVERY process
constructs the Checkpointer on the SAME (shared) directory and calls
``save``/``restore`` at the same steps; orbax writes each process's
addressable shards and barriers across the cluster. ``restore`` builds
its abstract target from the live runner, so globally-sharded arrays
come back in their production shardings (the env batch stays sharded
over ``data``, params replicated).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, runner: Any, wait: bool = False) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(runner))
        if wait:
            self.manager.wait_until_finished()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """``target`` is a runner with the right structure/shapes (e.g.
        a freshly ``init``-ed one); returns the restored runner."""
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return self.manager.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()
