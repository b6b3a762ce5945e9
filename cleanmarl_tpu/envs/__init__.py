from cleanmarl_tpu.envs.base import Environment, VecEnv
from cleanmarl_tpu.envs.registry import make, make_vec

__all__ = ["Environment", "VecEnv", "make", "make_vec"]
