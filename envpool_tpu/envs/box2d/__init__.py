"""Box2D family — JAX rigid-body rewrites of ``envpool/box2d/``."""

from envpool_tpu.core.envpool_api import py_env

from .lunar_lander import LunarLanderContinuousEnv, LunarLanderEnv

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
