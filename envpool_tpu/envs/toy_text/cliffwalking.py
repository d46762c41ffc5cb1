"""CliffWalking — pure-functional JAX dynamics.

Parity target: ``envpool/toy_text/cliffwalking.h:30-100``: 4x12 grid, start
(3,0), stepping onto the cliff (row 3, cols 1..10) costs -100 and teleports
back to start, goal (3,11) terminates; every move costs -1.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec


class CliffWalkingEnv(FuncEnv):
  """CliffWalking-v0."""

  name = "CliffWalking"

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"obs": ArraySpec(np.int32, (-1,), 0, 47)}

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 3)}

  @staticmethod
  def reset(cfg: Any, state: Any, key: jax.Array):
    del state, key
    new = {"x": jnp.int32(3), "y": jnp.int32(0)}
    return new, jnp.int32(3 * 12 + 0), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    del key
    act = action.astype(jnp.int32)
    # 0 up(-x) 1 right(+y) 2 down(+x) 3 left(-y)
    dx = jnp.where(act == 0, -1, jnp.where(act == 2, 1, 0))
    dy = jnp.where(act == 1, 1, jnp.where(act == 3, -1, 0))
    x = jnp.clip(state["x"] + dx, 0, 3)
    y = jnp.clip(state["y"] + dy, 0, 11)
    on_cliff = (x == 3) & (y > 0) & (y < 11)
    reward = jnp.where(on_cliff, -100.0, -1.0).astype(jnp.float32)
    x = jnp.where(on_cliff, 3, x)
    y = jnp.where(on_cliff, 0, y)
    term = (x == 3) & (y == 11)
    new = {"x": x, "y": y}
    return new, (x * 12 + y).astype(jnp.int32), reward, term, {}
