"""dm_control reward tolerance — traceable JAX version of rewards.py.

Same math as ``envpool/mujoco/dmc/utils.cc:176-245`` (dm_control's
``utils/rewards.py``), expressed branch-free so it vmaps over env
batches. ``sigmoid`` must be a static python string.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .rewards import (
  COSINE, GAUSSIAN, HYPERBOLIC, LINEAR, LONG_TAIL, QUADRATIC, RECIPROCAL,
  TANH_SQUARED,
)

__all__ = ["tolerance"]


def tolerance(
  x,
  bound_min: float = 0.0,
  bound_max: float = 0.0,
  margin: float = 0.0,
  value_at_margin: float = 0.1,
  sigmoid: str = GAUSSIAN,
):
  """Branch-free dm_control tolerance over a traced scalar/array ``x``."""
  x = jnp.asarray(x)
  in_bounds = (bound_min <= x) & (x <= bound_max)
  if margin <= 0.0:
    return in_bounds.astype(x.dtype)
  d = jnp.where(x < bound_min, bound_min - x, x - bound_max) / margin
  if sigmoid == GAUSSIAN:
    scale = math.sqrt(-2 * math.log(value_at_margin))
    value = jnp.exp(-0.5 * jnp.square(scale * d))
  elif sigmoid == HYPERBOLIC:
    scale = math.acosh(1 / value_at_margin)
    value = 1 / jnp.cosh(scale * d)
  elif sigmoid == LONG_TAIL:
    scale = math.sqrt(1 / value_at_margin - 1)
    value = 1 / (jnp.square(scale * d) + 1)
  elif sigmoid == RECIPROCAL:
    scale = 1 / value_at_margin - 1
    value = 1 / (jnp.abs(d) * scale + 1)
  elif sigmoid == COSINE:
    scale = math.acos(2 * value_at_margin - 1) / math.pi
    s = d * scale
    value = jnp.where(
      jnp.abs(s) < 1, (1 + jnp.cos(math.pi * s)) / 2, 0.0
    )
  elif sigmoid == LINEAR:
    s = d * (1 - value_at_margin)
    value = jnp.where(jnp.abs(s) < 1, 1 - s, 0.0)
  elif sigmoid == QUADRATIC:
    s = d * math.sqrt(1 - value_at_margin)
    value = jnp.where(jnp.abs(s) < 1, 1 - jnp.square(s), 0.0)
  elif sigmoid == TANH_SQUARED:
    scale = math.atanh(math.sqrt(1 - value_at_margin))
    value = 1 - jnp.square(jnp.tanh(d * scale))
  else:
    raise ValueError(f"Unknown sigmoid {sigmoid}")
  return jnp.where(in_bounds, 1.0, value).astype(x.dtype)
