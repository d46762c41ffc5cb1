"""FrozenLake — pure-functional JAX dynamics.

Parity target: ``envpool/toy_text/frozen_lake.h:30-110``: slippery move
``act = (act + U{-1,0,1} + 4) % 4``, clamped grid walk over the standard
4x4 / 8x8 maps, terminal on Hole (reward 0) or Goal (reward 1).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

_MAP4 = ["SFFF", "FHFH", "FFFH", "HFFG"]
_MAP8 = [
  "SFFFFFFF", "FFFFFFFF", "FFFHFFFF", "FFFFFHFF", "FFFHFFFF", "FHHFFFHF",
  "FHFFHFHF", "FFFHFFFG"
]


def _tiles(size: int) -> np.ndarray:
  """0=frozen/start, 1=hole, 2=goal."""
  rows = _MAP8 if size == 8 else _MAP4
  code = {"S": 0, "F": 0, "H": 1, "G": 2}
  return np.array([[code[c] for c in r] for r in rows], np.int32)


class FrozenLakeEnv(FuncEnv):
  """FrozenLake-v1 / FrozenLake8x8-v1."""

  name = "FrozenLake"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"reward_threshold": 0.7, "size": 4}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {
      "obs": ArraySpec(np.int32, (-1,), 0, cfg.size * cfg.size - 1)
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 3)}

  @staticmethod
  def reset(cfg: Any, state: Any, key: jax.Array):
    del state, key
    new = {"x": jnp.int32(0), "y": jnp.int32(0)}
    return new, jnp.int32(0), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    size = cfg.size if cfg.size == 8 else 4
    tiles = jnp.asarray(_tiles(size))
    slip = jax.random.randint(key, (), -1, 2, jnp.int32)
    act = (action.astype(jnp.int32) + slip + 4) % 4
    # act: 0 left(-y) 1 down(+x) 2 right(+y) 3 up(-x)
    dx = jnp.where(act == 1, 1, jnp.where(act == 3, -1, 0))
    dy = jnp.where(act == 2, 1, jnp.where(act == 0, -1, 0))
    x = jnp.clip(state["x"] + dx, 0, size - 1)
    y = jnp.clip(state["y"] + dy, 0, size - 1)
    tile = tiles[x, y]
    term = tile > 0
    reward = jnp.where(tile == 2, 1.0, 0.0).astype(jnp.float32)
    new = {"x": x, "y": y}
    return new, (x * size + y).astype(jnp.int32), reward, term, {}
