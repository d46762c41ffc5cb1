"""MountainCar (discrete + continuous) — pure-functional JAX dynamics.

Parity targets: ``envpool/classic_control/mountain_car.h:30-120`` and
``envpool/classic_control/mountain_car_continuous.h:30-124``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

_MIN_POS = -1.2
_MAX_POS = 0.6
_MAX_SPEED = 0.07
_GRAVITY = 0.0025


def _reset_state(key: jax.Array) -> Dict[str, jax.Array]:
  pos = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
  return {"pos": pos, "vel": jnp.float32(0.0)}


def _obs(state: Dict[str, jax.Array]) -> jax.Array:
  return jnp.stack([state["pos"], state["vel"]]).astype(jnp.float32)


def _integrate(pos: jax.Array, vel: jax.Array, push: jax.Array):
  """Shared hill-climb update with the reference's boundary handling."""
  vel = vel + push - jnp.cos(3 * pos) * _GRAVITY
  vel = jnp.clip(vel, -_MAX_SPEED, _MAX_SPEED)
  pos = jnp.clip(pos + vel, _MIN_POS, _MAX_POS)
  vel = jnp.where((pos == _MIN_POS) & (vel < 0), 0.0, vel)
  return pos, vel


class MountainCarEnv(FuncEnv):
  """MountainCar-v0 (3 discrete actions)."""

  name = "MountainCar"
  _FORCE = 0.001
  _GOAL_POS = 0.5

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"reward_threshold": -110.0}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (2,), [-1.2, -0.07], [0.6, 0.07])
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 2)}

  @staticmethod
  def reset(cfg: Any, state: Any, key: jax.Array):
    del state
    new = _reset_state(key)
    return new, _obs(new), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    del key
    push = (action.astype(jnp.float32) - 1.0) * cls._FORCE
    pos, vel = _integrate(state["pos"], state["vel"], push)
    term = (pos >= cls._GOAL_POS) & (vel >= 0.0)
    new = {"pos": pos, "vel": vel}
    return new, _obs(new), jnp.float32(-1.0), term, {}


class MountainCarContinuousEnv(FuncEnv):
  """MountainCarContinuous-v0 (1-d continuous action)."""

  name = "MountainCarContinuous"
  _POWER = 0.0015
  _GOAL_POS = 0.45

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"reward_threshold": 90.0}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (2,), [-1.2, -0.07], [0.6, 0.07])
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.float32, (-1, 1), -1.0, 1.0)}

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    del state
    new = _reset_state(key)
    return new, _obs(new), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    del key
    raw = action[0]
    # reward penalty uses the raw (unclamped) action, as the reference does
    reward = -0.1 * raw * raw
    act = jnp.clip(raw, -1.0, 1.0)
    pos, vel = _integrate(state["pos"], state["vel"], act * cls._POWER)
    term = (pos >= cls._GOAL_POS) & (vel >= 0.0)
    reward = jnp.where(term, reward + 100.0, reward)
    new = {"pos": pos, "vel": vel}
    return new, _obs(new), reward.astype(jnp.float32), term, {}
