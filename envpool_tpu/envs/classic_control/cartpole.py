"""CartPole — pure-functional JAX dynamics.

Parity target: ``envpool/classic_control/cartpole.h:30-122`` (itself aligned
with gym's cartpole). Euler integration with kTau=0.02, uniform(-0.05, 0.05)
init on all four state variables, termination at |x| > 2.4 or
|theta| > 12 degrees; reward 1.0 per step, 0.0 on reset. The reference does
the math in float64 and stores float32 obs — we integrate in float32 (TPU
native); the alignment test checks agreement to float32 tolerance.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

_GRAVITY = 9.8
_MASS_CART = 1.0
_MASS_POLE = 0.1
_MASS_TOTAL = _MASS_CART + _MASS_POLE
_LENGTH = 0.5
_MASS_POLE_LENGTH = _MASS_POLE * _LENGTH
_FORCE_MAG = 10.0
_TAU = 0.02
_THETA_THRESHOLD = 12 * 2 * math.pi / 360
_X_THRESHOLD = 2.4
_INIT_RANGE = 0.05


class CartPoleEnv(FuncEnv):
  """CartPole-v0/v1."""

  name = "CartPole"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"reward_threshold": 195.0}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    fmax = float(np.finfo(np.float32).max)
    return {
      "obs": ArraySpec(
        np.float32, (4,),
        [-4.8, -fmax, -math.pi / 7.5, -fmax],
        [4.8, fmax, math.pi / 7.5, fmax],
      )
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 1)}

  @staticmethod
  def reset(cfg: Any, state: Any, key: jax.Array) -> Tuple[Any, Any, Dict]:
    del state
    s = jax.random.uniform(
      key, (4,), jnp.float32, -_INIT_RANGE, _INIT_RANGE
    )
    return {"s": s}, s, {}

  @staticmethod
  def step(
    cfg: Any, state: Any, action: jax.Array, key: jax.Array
  ) -> Tuple[Any, Any, jax.Array, jax.Array, Dict]:
    del key
    x, x_dot, theta, theta_dot = (
      state["s"][0], state["s"][1], state["s"][2], state["s"][3]
    )
    force = jnp.where(action == 1, _FORCE_MAG, -_FORCE_MAG)
    costheta = jnp.cos(theta)
    sintheta = jnp.sin(theta)
    temp = (
      force + _MASS_POLE_LENGTH * theta_dot * theta_dot * sintheta
    ) / _MASS_TOTAL
    theta_acc = (_GRAVITY * sintheta - costheta * temp) / (
      _LENGTH * (4.0 / 3.0 - _MASS_POLE * costheta * costheta / _MASS_TOTAL)
    )
    x_acc = temp - _MASS_POLE_LENGTH * theta_acc * costheta / _MASS_TOTAL

    x = x + _TAU * x_dot
    x_dot = x_dot + _TAU * x_acc
    theta = theta + _TAU * theta_dot
    theta_dot = theta_dot + _TAU * theta_acc
    term = (
      (x < -_X_THRESHOLD) | (x > _X_THRESHOLD) |
      (theta < -_THETA_THRESHOLD) | (theta > _THETA_THRESHOLD)
    )
    s = jnp.stack([x, x_dot, theta, theta_dot]).astype(jnp.float32)
    return {"s": s}, s, jnp.float32(1.0), term, {}
