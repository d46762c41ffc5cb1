"""ViZDoom family (host tier; requires the ``vizdoom`` wheel).

``action_set`` (combined-action discretization) is pure and always
importable; the env/pool classes gate on the wheel — accessing them
without it raises ImportError (same failure mode the registry expects).
"""

from . import action_set  # noqa: F401  -- pure, wheel-free

try:
  import vizdoom  # noqa: F401
  _IMPORT_ERROR = None
except ImportError as _e:  # wheel absent (e.g. CI)
  _IMPORT_ERROR = _e

__all__ = [
  "action_set",
  "VizdoomEnv",
  "VizdoomEnvSpec",
  "VizdoomDMEnvPool",
  "VizdoomGymEnvPool",
  "VizdoomGymnasiumEnvPool",
]

if _IMPORT_ERROR is None:
  from envpool_tpu.core.envpool_api import py_env
  from envpool_tpu.core.host_pool import HostEnvPool

  from .vizdoom_env import VizdoomEnv

  (
    VizdoomEnvSpec,
    VizdoomDMEnvPool,
    VizdoomGymEnvPool,
    VizdoomGymnasiumEnvPool,
  ) = py_env(VizdoomEnv, pool_base=HostEnvPool)
else:

  def __getattr__(name: str):
    if name in __all__:
      raise ImportError(
        f"envpool_tpu.envs.vizdoom.{name} requires the 'vizdoom' wheel"
      ) from _IMPORT_ERROR
    raise AttributeError(name)
