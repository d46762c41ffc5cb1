"""MiniGrid family — TPU-native rewrite of ``envpool/minigrid/``."""

from envpool_tpu.core.envpool_api import py_env

from .minigrid import EmptyEnv

(
  EmptyEnvSpec,
  EmptyDMEnvPool,
  EmptyGymEnvPool,
  EmptyGymnasiumEnvPool,
) = py_env(EmptyEnv)

__all__ = [
  "EmptyEnv",
  "EmptyEnvSpec",
  "EmptyDMEnvPool",
  "EmptyGymEnvPool",
  "EmptyGymnasiumEnvPool",
]
