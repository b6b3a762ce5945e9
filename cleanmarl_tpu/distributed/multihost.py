"""Multi-host process bootstrap: ``jax.distributed`` initialization.

The reference has no multi-node story at all (SURVEY.md §5.8 — its only
"backend" is pickle-over-Pipe to local env workers). Here multi-host
training is the standard JAX multi-controller recipe: every host runs
the SAME training CLI with ``--coordinator_address host0:port
--num_processes N --process_id i``; after ``jax.distributed.initialize``
all hosts' chips form one global device set, ``make_mesh()`` spans it,
and the env batch shards host-locally over the ``data`` axis (each
process drives its own chips; XLA's collectives ride ICI within a host
and DCN across hosts).

See MULTIHOST.md for the launch recipe and scaling methodology.
"""
from __future__ import annotations

import jax


def maybe_initialize(cfg) -> bool:
    """Initialize jax.distributed when the config carries a coordinator
    address. Must run before any other JAX call in the process — the
    per-algorithm CLIs invoke it from ``cli()`` right after parsing.

    Returns True when distributed mode was initialized."""
    addr = getattr(cfg, "coordinator_address", "")
    if not addr:
        return False
    num_processes = int(getattr(cfg, "num_processes", 1))
    process_id = int(getattr(cfg, "process_id", 0))
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_main_process() -> bool:
    return jax.process_index() == 0
