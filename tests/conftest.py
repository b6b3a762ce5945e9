"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip sharding logic is validated on virtual CPU devices
(``--xla_force_host_platform_device_count=8``), the strategy SURVEY.md §4
prescribes; the single real TPU chip is reserved for bench runs.

NOTE: the ambient environment imports jax at interpreter start (site
customization) with JAX_PLATFORMS pinned to the remote-TPU tunnel, so
the env var is already snapshotted by jax's config before this file
runs. ``jax.config.update`` still works because backends initialize
lazily — it MUST be used instead of os.environ here.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
