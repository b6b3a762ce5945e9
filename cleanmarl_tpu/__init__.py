"""CleanMARL-TPU: a TPU-native rebuild of CleanMARL (AmineAndam04/cleanmarl).

Cooperative deep MARL — VDN, QMIX, COMA, MADDPG, FACMAC, IPPO, MAPPO —
re-designed as fully-jitted XLA actor-learner programs:

- Environments are pure-JAX ``reset``/``step`` functions, vmapped over an
  env batch (replaces the reference's one-Python-process-per-env Pipe
  workers, /root/reference/cleanmarl/vdn_multienvs.py:229-264).
- Rollouts are ``lax.scan`` over time; per-agent networks are batched over
  the agent axis inside one XLA program.
- Replay buffers live in HBM as preallocated pytrees with integer write
  cursors (donated between steps).
- Multi-chip: the env batch and replay shard over a ``jax.sharding.Mesh``
  data axis; gradients all-reduce with ``psum`` under ``shard_map``.

The public contract mirrors the reference: the CTDE env interface
(per-agent obs, global state, avail-action masks, team reward —
/root/reference/cleanmarl/env/common_interface.py:5-23), the seven
algorithms with feed-forward and recurrent (GRU) policies, and the
TensorBoard metric names (``rollout/*``, ``train/*``, ``eval/*``).
"""

__version__ = "0.1.0"
