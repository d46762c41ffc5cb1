"""envpool_tpu: a TPU-native batched RL environment execution framework.

A from-scratch rebuild of the capabilities of AlignmentResearch/envpool with
a TPU-first architecture: env dynamics are pure-functional JAX programs
batched with ``vmap`` under ``jit``, sharded over device meshes with
``jax.sharding``, with envpool's batched gym / gymnasium / dm_env API
(send/recv/step/reset + in-jit xla interface) on top.
"""

import envpool_tpu.entry  # noqa: F401
from envpool_tpu.registration import (
  list_all_envs,
  make,
  make_dm,
  make_gym,
  make_gymnasium,
  make_spec,
  register,
)

__version__ = "0.1.0"
__all__ = [
  "register",
  "make",
  "make_dm",
  "make_gym",
  "make_gymnasium",
  "make_spec",
  "list_all_envs",
]
