"""Acrobot — pure-functional JAX dynamics with RK4 integration.

Parity target: ``envpool/classic_control/acrobot.h:30-212`` (gym-aligned
"book" dynamics): RK4 over [theta1, theta2, dtheta1, dtheta2, torque],
angle wrap to [-pi, pi), velocity clamps at 4π/9π, reward -1 until the tip
crosses the line (-cos(s0) - cos(s0+s1) > 1 -> reward 0, terminal).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

_G = 9.8
_DT = 0.2
_L = 1.0
_M = 1.0
_LC = 0.5
_I = 1.0
_MAX_VEL1 = 4 * math.pi
_MAX_VEL2 = 9 * math.pi
_INIT_RANGE = 0.1


def _derivs(s: jax.Array) -> jax.Array:
  theta1, theta2, dtheta1, dtheta2, a = s[0], s[1], s[2], s[3], s[4]
  d1 = (
    _M * _LC * _LC +
    _M * (_L * _L + _LC * _LC + 2 * _L * _LC * jnp.cos(theta2)) + _I * 2
  )
  d2 = _M * (_LC * _LC + _L * _LC * jnp.cos(theta2)) + _I
  phi2 = _M * _LC * _G * jnp.cos(theta1 + theta2 - math.pi / 2)
  phi1 = (
    -(dtheta2 + 2 * dtheta1) * _M * _L * _LC * dtheta2 * jnp.sin(theta2) +
    _M * (_LC + _L) * _G * jnp.cos(theta1 - math.pi / 2) + phi2
  )
  ddtheta2 = (
    a + d2 / d1 * phi1 -
    _M * _L * _LC * dtheta1 * dtheta1 * jnp.sin(theta2) - phi2
  ) / (_M * _LC * _LC + _I - d2 * d2 / d1)
  ddtheta1 = -(d2 * ddtheta2 + phi1) / d1
  return jnp.stack(
    [dtheta1, dtheta2, ddtheta1, ddtheta2, jnp.zeros_like(a)]
  )


def _rk4(y0: jax.Array) -> jax.Array:
  k1 = _derivs(y0)
  k2 = _derivs(y0 + k1 * (_DT / 2))
  k3 = _derivs(y0 + k2 * (_DT / 2))
  k4 = _derivs(y0 + k3 * _DT)
  return y0 + (k1 + k2 * 2 + k3 * 2 + k4) * (_DT / 6.0)


def _angle_wrap(theta: jax.Array) -> jax.Array:
  return theta - 2 * math.pi * jnp.floor((theta + math.pi) / (2 * math.pi))


class AcrobotEnv(FuncEnv):
  """Acrobot-v1."""

  name = "Acrobot"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"reward_threshold": -100.0}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(
        np.float32, (6,),
        [-1.0, -1.0, -1.0, -1.0, -4 * math.pi, -9 * math.pi],
        [1.0, 1.0, 1.0, 1.0, 4 * math.pi, 9 * math.pi],
      ),
      "info:state": ArraySpec(np.float32, (2,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 2)}

  @staticmethod
  def _out(s: jax.Array):
    obs = jnp.stack(
      [
        jnp.cos(s[0]), jnp.sin(s[0]), jnp.cos(s[1]), jnp.sin(s[1]),
        s[2], s[3]
      ]
    ).astype(jnp.float32)
    info = {"state": s[:2].astype(jnp.float32)}
    return obs, info

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    del state
    s4 = jax.random.uniform(
      key, (4,), jnp.float32, -_INIT_RANGE, _INIT_RANGE
    )
    s = jnp.concatenate([s4, jnp.zeros(1, jnp.float32)])
    obs, info = cls._out(s)
    return {"s": s}, obs, info

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    del key
    s = state["s"].at[4].set(action.astype(jnp.float32) - 1.0)
    s = _rk4(s)
    s = s.at[0].set(_angle_wrap(s[0]))
    s = s.at[1].set(_angle_wrap(s[1]))
    s = s.at[2].set(jnp.clip(s[2], -_MAX_VEL1, _MAX_VEL1))
    s = s.at[3].set(jnp.clip(s[3], -_MAX_VEL2, _MAX_VEL2))
    term = -jnp.cos(s[0]) - jnp.cos(s[0] + s[1]) > 1
    reward = jnp.where(term, 0.0, -1.0).astype(jnp.float32)
    obs, info = cls._out(s)
    return {"s": s}, obs, reward, term, info
