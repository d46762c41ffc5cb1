"""Atari family (host-native ALE tier; requires ale_py at pool-build time).

The module itself imports without ALE (the wrapper-stack logic is testable
against a fake emulator); constructing a spec/pool requires ale_py, and
task registration is gated on it (``envpool/entry.py:17-55`` pattern).
"""

from envpool_tpu.core.envpool_api import py_env
from envpool_tpu.core.host_pool import HostEnvPool

from .atari_device_demo import PongDemoEnv
from .atari_env import AtariEnv

(
  AtariEnvSpec,
  AtariDMEnvPool,
  AtariGymEnvPool,
  AtariGymnasiumEnvPool,
) = py_env(AtariEnv, pool_base=HostEnvPool)

(
  PongDemoEnvSpec,
  PongDemoDMEnvPool,
  PongDemoGymEnvPool,
  PongDemoGymnasiumEnvPool,
) = py_env(PongDemoEnv)

__all__ = [
  "AtariEnv",
  "AtariEnvSpec",
  "AtariDMEnvPool",
  "AtariGymEnvPool",
  "AtariGymnasiumEnvPool",
  "PongDemoEnv",
  "PongDemoEnvSpec",
  "PongDemoDMEnvPool",
  "PongDemoGymEnvPool",
  "PongDemoGymnasiumEnvPool",
]
