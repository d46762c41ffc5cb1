"""Catch (bsuite) — pure-functional JAX dynamics.

Parity target: ``envpool/toy_text/catch.h:30-100``: height x width board,
ball falls one row per step, paddle moves {-1,0,+1}, reward ±1 when the
ball reaches the bottom row. Obs renders ball + paddle as ones.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec


class CatchEnv(FuncEnv):
  """Catch-v0."""

  name = "Catch"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"height": 10, "width": 5}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.float32, (cfg.height, cfg.width), 0.0, 1.0)
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 2)}

  @staticmethod
  def _obs(cfg: Any, x, y, paddle) -> jax.Array:
    h, w = cfg.height, cfg.width
    board = jnp.zeros((h, w), jnp.float32)
    board = board.at[x, y].set(1.0)
    board = board.at[h - 1, paddle].set(1.0)
    return board

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    del state
    y = jax.random.randint(key, (), 0, cfg.width, jnp.int32)
    x = jnp.int32(0)
    paddle = jnp.int32(cfg.width // 2)
    new = {"x": x, "y": y, "paddle": paddle}
    return new, cls._obs(cfg, x, y, paddle), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    del key
    paddle = jnp.clip(
      state["paddle"] + action.astype(jnp.int32) - 1, 0, cfg.width - 1
    )
    x = state["x"] + 1
    y = state["y"]
    term = x == cfg.height - 1
    reward = jnp.where(
      term, jnp.where(y == paddle, 1.0, -1.0), 0.0
    ).astype(jnp.float32)
    new = {"x": x, "y": y, "paddle": paddle}
    return new, cls._obs(cfg, x, y, paddle), reward, term, {}
