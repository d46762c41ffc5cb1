"""Taxi — pure-functional JAX dynamics.

Parity target: ``envpool/toy_text/taxi.h:30-126``: 5x5 grid with wall map,
passenger at one of 4 depots (s==4 means in taxi), destination depot t;
actions: 0 south(+x) 1 north(-x) 2 east(+y) 3 west(-y) 4 pickup 5 dropoff.
Obs encoding ``((x*5+y)*5+s)*4+t`` matches gym's Taxi-v3.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

# wall map rows "|:|::|" — movement right from (x, y) allowed iff
# map_[x][y+1] == ':'; left allowed iff map_[x][y] == ':'
_MAP = ["|:|::|", "|:|::|", "|::::|", "||:|:|", "||:|:|"]
_RIGHT_OK = np.array(
  [[r[y + 1] == ":" for y in range(5)] for r in _MAP], np.bool_
)
_LEFT_OK = np.array(
  [[r[y] == ":" for y in range(5)] for r in _MAP], np.bool_
)
# depot locations 0..3 and the depot id under each cell (-1 if none)
_LOC = np.array([[0, 0], [0, 4], [4, 0], [4, 3]], np.int32)
_LOC_MAP = -np.ones((5, 5), np.int32)
for _i, (_x, _y) in enumerate(_LOC):
  _LOC_MAP[_x, _y] = _i


class TaxiEnv(FuncEnv):
  """Taxi-v3."""

  name = "Taxi"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {"reward_threshold": 8.0}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"obs": ArraySpec(np.int32, (-1,), 0, 499)}

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 5)}

  @staticmethod
  def _obs(s: Dict[str, jax.Array]) -> jax.Array:
    return (
      ((s["x"] * 5 + s["y"]) * 5 + s["s"]) * 4 + s["t"]
    ).astype(jnp.int32)

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array):
    del state
    k = jax.random.split(key, 4)
    new = {
      "x": jax.random.randint(k[0], (), 0, 5, jnp.int32),
      "y": jax.random.randint(k[1], (), 0, 5, jnp.int32),
      "s": jax.random.randint(k[2], (), 0, 4, jnp.int32),
      "t": jax.random.randint(k[3], (), 0, 4, jnp.int32),
    }
    return new, cls._obs(new), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    del key
    act = action.astype(jnp.int32)
    x, y, s, t = state["x"], state["y"], state["s"], state["t"]
    right_ok = jnp.asarray(_RIGHT_OK)[x, y]
    left_ok = jnp.asarray(_LEFT_OK)[x, y]
    loc = jnp.asarray(_LOC)
    loc_at = jnp.asarray(_LOC_MAP)[x, y]

    nx = jnp.where(
      act == 0, jnp.minimum(x + 1, 4),
      jnp.where(act == 1, jnp.maximum(x - 1, 0), x)
    )
    ny = jnp.where(
      (act == 2) & right_ok, y + 1,
      jnp.where((act == 3) & left_ok, y - 1, y)
    )

    # pickup
    pick_ok = (s < 4) & (x == loc[jnp.minimum(s, 3), 0]) & (
      y == loc[jnp.minimum(s, 3), 1]
    )
    # dropoff
    drop_win = (s == 4) & (x == loc[t, 0]) & (y == loc[t, 1])
    drop_depot = (s == 4) & ~drop_win & (loc_at >= 0)

    ns = jnp.where(
      (act == 4) & pick_ok, 4,
      jnp.where(
        (act == 5) & drop_win, t,
        jnp.where((act == 5) & drop_depot, loc_at, s)
      )
    )
    term = (act == 5) & drop_win
    reward = jnp.where(
      (act == 4) & ~pick_ok, -10.0,
      jnp.where(
        (act == 5) & drop_win, 20.0,
        jnp.where((act == 5) & ~drop_win & ~drop_depot, -10.0, -1.0)
      )
    ).astype(jnp.float32)
    new = {
      "x": jnp.where(act <= 1, nx, x),
      "y": jnp.where((act == 2) | (act == 3), ny, y),
      "s": ns,
      "t": t,
    }
    return new, cls._obs(new), reward, term, {}
