"""Pendulum — pure-functional JAX dynamics.

Parity target: ``envpool/classic_control/pendulum.h:30-122``. Config key
``version`` switches v0/v1 integration order (clamp theta_dot before/after
updating theta). Reward is computed from the pre-step state:
``-(theta^2 + 0.1 theta_dot^2 + 0.001 u^2)``; never terminal.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

_MAX_SPEED = 8.0
_MAX_TORQUE = 2.0
_DT = 0.05
_GRAVITY = 10.0


def _angle_wrap(theta: jax.Array) -> jax.Array:
  """Wrap into [-pi, pi), matching the reference's while loops."""
  return theta - 2 * math.pi * jnp.floor((theta + math.pi) / (2 * math.pi))


class PendulumEnv(FuncEnv):
  """Pendulum-v0/v1."""

  name = "Pendulum"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"version": 0}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (3,), [-1.0, -1.0, -8.0], [1.0, 1.0, 8.0])
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 1), -2.0, 2.0)}

  @staticmethod
  def _obs(theta: jax.Array, theta_dot: jax.Array) -> jax.Array:
    return jnp.stack(
      [jnp.cos(theta), jnp.sin(theta), theta_dot]
    ).astype(jnp.float32)

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    del state
    k1, k2 = jax.random.split(key)
    theta = jax.random.uniform(k1, (), jnp.float32, -math.pi, math.pi)
    theta_dot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
    return {"theta": theta, "theta_dot": theta_dot}, cls._obs(
      theta, theta_dot
    ), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    del key
    theta, theta_dot = state["theta"], state["theta_dot"]
    u = jnp.clip(action[0], -_MAX_TORQUE, _MAX_TORQUE)
    cost = theta * theta + 0.1 * theta_dot * theta_dot + 0.001 * u * u
    new_theta_dot = theta_dot + 3 * (
      _GRAVITY / 2 * jnp.sin(theta) + u
    ) * _DT
    if cfg.version == 0:
      theta = theta + new_theta_dot * _DT
    theta_dot = jnp.clip(new_theta_dot, -_MAX_SPEED, _MAX_SPEED)
    if cfg.version == 1:
      theta = theta + theta_dot * _DT
    theta = _angle_wrap(theta)
    new_state = {"theta": theta, "theta_dot": theta_dot}
    return new_state, cls._obs(theta, theta_dot), (-cost).astype(
      jnp.float32
    ), jnp.bool_(False), {}
