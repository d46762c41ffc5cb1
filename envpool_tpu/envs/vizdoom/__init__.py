"""ViZDoom family (host tier; requires the ``vizdoom`` wheel)."""

import vizdoom  # noqa: F401  -- gate on availability

from envpool_tpu.core.envpool_api import py_env
from envpool_tpu.core.host_pool import HostEnvPool

from .vizdoom_env import VizdoomEnv

(
  VizdoomEnvSpec,
  VizdoomDMEnvPool,
  VizdoomGymEnvPool,
  VizdoomGymnasiumEnvPool,
) = py_env(VizdoomEnv, pool_base=HostEnvPool)

__all__ = [
  "VizdoomEnv",
  "VizdoomEnvSpec",
  "VizdoomDMEnvPool",
  "VizdoomGymEnvPool",
  "VizdoomGymnasiumEnvPool",
]
