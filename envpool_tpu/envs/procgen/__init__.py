"""Procgen family (host tier; requires the ``procgen`` wheel)."""

import procgen  # noqa: F401  -- gate on availability

from envpool_tpu.core.envpool_api import py_env
from envpool_tpu.core.host_pool import HostEnvPool

from .procgen_env import ProcgenEnv

(
  ProcgenEnvSpec,
  ProcgenDMEnvPool,
  ProcgenGymEnvPool,
  ProcgenGymnasiumEnvPool,
) = py_env(ProcgenEnv, pool_base=HostEnvPool)

__all__ = [
  "ProcgenEnv",
  "ProcgenEnvSpec",
  "ProcgenDMEnvPool",
  "ProcgenGymEnvPool",
  "ProcgenGymnasiumEnvPool",
]
