"""JAX-native safe-RL environment suite (registration side effects)."""

from fsrl_tpu.envs.base import EnvState, SafeEnv, make, register, registered_tasks
from fsrl_tpu.envs import ant, ball, car, drone, navigation  # noqa: F401 — registers tasks

__all__ = ["EnvState", "SafeEnv", "make", "register", "registered_tasks"]
