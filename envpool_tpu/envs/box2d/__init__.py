"""Box2D family — JAX rigid-body rewrites of ``envpool/box2d/``."""

from envpool_tpu.core.envpool_api import py_env

from .bipedal_walker import BipedalWalkerEnv, BipedalWalkerHardcoreEnv
from .lunar_lander import LunarLanderContinuousEnv, LunarLanderEnv

(
  BipedalWalkerEnvSpec,
  BipedalWalkerDMEnvPool,
  BipedalWalkerGymEnvPool,
  BipedalWalkerGymnasiumEnvPool,
) = py_env(BipedalWalkerEnv)

(
  BipedalWalkerHardcoreEnvSpec,
  BipedalWalkerHardcoreDMEnvPool,
  BipedalWalkerHardcoreGymEnvPool,
  BipedalWalkerHardcoreGymnasiumEnvPool,
) = py_env(BipedalWalkerHardcoreEnv)

(
  LunarLanderEnvSpec,
  LunarLanderDMEnvPool,
  LunarLanderGymEnvPool,
  LunarLanderGymnasiumEnvPool,
) = py_env(LunarLanderEnv)

(
  LunarLanderContinuousEnvSpec,
  LunarLanderContinuousDMEnvPool,
  LunarLanderContinuousGymEnvPool,
  LunarLanderContinuousGymnasiumEnvPool,
) = py_env(LunarLanderContinuousEnv)

__all__ = [
  "BipedalWalkerEnv",
  "BipedalWalkerHardcoreEnv",
  "BipedalWalkerEnvSpec",
  "BipedalWalkerDMEnvPool",
  "BipedalWalkerGymEnvPool",
  "BipedalWalkerGymnasiumEnvPool",
  "BipedalWalkerHardcoreEnvSpec",
  "BipedalWalkerHardcoreDMEnvPool",
  "BipedalWalkerHardcoreGymEnvPool",
  "BipedalWalkerHardcoreGymnasiumEnvPool",
  "LunarLanderEnv",
  "LunarLanderContinuousEnv",
  "LunarLanderEnvSpec",
  "LunarLanderDMEnvPool",
  "LunarLanderGymEnvPool",
  "LunarLanderGymnasiumEnvPool",
  "LunarLanderContinuousEnvSpec",
  "LunarLanderContinuousDMEnvPool",
  "LunarLanderContinuousGymEnvPool",
  "LunarLanderContinuousGymnasiumEnvPool",
]
