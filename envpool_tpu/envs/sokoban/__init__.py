"""Sokoban family — TPU-native rewrite of ``envpool/sokoban/``."""

from envpool_tpu.core.envpool_api import py_env

from .sokoban import SokobanEnv

(
  SokobanEnvSpec,
  SokobanDMEnvPool,
  SokobanGymEnvPool,
  SokobanGymnasiumEnvPool,
) = py_env(SokobanEnv)

__all__ = [
  "SokobanEnv",
  "SokobanEnvSpec",
  "SokobanDMEnvPool",
  "SokobanGymEnvPool",
  "SokobanGymnasiumEnvPool",
]
