"""Dummy developer-template family."""

from envpool_tpu.core.envpool_api import py_env

from .dummy import DummyEnv

(
  DummyEnvSpec,
  DummyDMEnvPool,
  DummyGymEnvPool,
  DummyGymnasiumEnvPool,
) = py_env(DummyEnv)

__all__ = [
  "DummyEnv",
  "DummyEnvSpec",
  "DummyDMEnvPool",
  "DummyGymEnvPool",
  "DummyGymnasiumEnvPool",
]
