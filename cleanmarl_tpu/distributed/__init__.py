from cleanmarl_tpu.distributed.dp import (
    DATA_FIELD_DIMS,
    global_runner_init,
    make_mesh,
    replicate,
    runner_pspecs,
    runner_shardings,
    shard_runner,
)
from cleanmarl_tpu.distributed.multihost import is_main_process, maybe_initialize

__all__ = [
    "DATA_FIELD_DIMS",
    "global_runner_init",
    "is_main_process",
    "make_mesh",
    "maybe_initialize",
    "replicate",
    "runner_pspecs",
    "runner_shardings",
    "shard_runner",
]
