"""Environment registry — ``make(env_type, env_name, **kwargs)``.

Mirrors the reference's ``environment()`` factory switch
(/root/reference/cleanmarl/vdn.py:159-169): env_type in {"pz"/"mpe",
"smaclite", "lbf", "matrix"}. All targets are pure-JAX ports here; the
reference's Python wrappers (pettingzoo/smaclite/lbforaging) have no
on-device equivalent, so each family is re-implemented as a JAX env with
matching observation/action/reward layouts (see each module's docstring
for the fidelity contract).
"""
from __future__ import annotations

from cleanmarl_tpu.envs.base import Environment, VecEnv
from cleanmarl_tpu.envs.wrappers import AgentIDWrapper


def make(env_type: str, env_name: str, agent_ids: bool = False,
         env_family: str = "mpe", **kwargs):
    env_type = env_type.lower()
    if env_type == "matrix":
        from cleanmarl_tpu.envs.matrix_game import MatrixGame

        env = MatrixGame(**kwargs)
    elif env_type == "mpe" or (env_type == "pz" and env_family == "mpe"):
        from cleanmarl_tpu.envs import mpe

        env = mpe.make(env_name, **kwargs)
    elif env_type == "pz":
        # real host PettingZoo env through io_callback (envs/external.py);
        # agent_ids handled by the host wrapper, no AgentIDWrapper needed
        from cleanmarl_tpu.envs.external import HostEnvFamily
        from cleanmarl_tpu.envs.pettingzoo_host import PettingZooHostEnv

        return HostEnvFamily(
            lambda: PettingZooHostEnv(
                env_family, env_name, agent_ids=agent_ids, **kwargs
            )
        )
    elif env_type == "smaclite":
        from cleanmarl_tpu.envs import smaclite

        env = smaclite.make(env_name, **kwargs)
    elif env_type == "pursuit":
        # pure-JAX SISL pursuit (TPU fast path); env_type="pz" with
        # env_family="sisl" keeps the exact-upstream host io_callback
        # route. env_name is accepted for CLI symmetry ("pursuit_v4").
        from cleanmarl_tpu.envs.pursuit import Pursuit

        env = Pursuit(**kwargs)
    elif env_type == "lbf":
        from cleanmarl_tpu.envs import lbf

        env = lbf.make(env_name, **kwargs)
    else:
        raise ValueError(f"unknown env_type {env_type!r}")
    if agent_ids:
        env = AgentIDWrapper(env)
    return env


def make_vec(
    env_type: str,
    env_name: str,
    num_envs: int,
    agent_ids: bool = False,
    auto_reset: bool = True,
    **kwargs,
) -> VecEnv:
    env = make(env_type, env_name, agent_ids=agent_ids, **kwargs)
    return VecEnv(env, num_envs, auto_reset=auto_reset)
