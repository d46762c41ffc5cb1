"""Core runtime: specs, functional env interface, pool engine, dialects."""

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.env_spec import EnvSpec
from envpool_tpu.core.envpool_api import py_env
from envpool_tpu.core.pool import PoolState, TpuEnvPool, XlaHandle
from envpool_tpu.core.spec import ArraySpec

__all__ = [
  "ArraySpec",
  "EnvSpec",
  "FuncEnv",
  "PoolState",
  "TpuEnvPool",
  "XlaHandle",
  "py_env",
]
