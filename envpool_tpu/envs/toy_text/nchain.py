"""NChain — pure-functional JAX dynamics.

Parity target: ``envpool/toy_text/nchain.h:30-100``: 5-state chain, 20%
action flip, forward (+1 state, 0 reward; 10 at the end), backward resets
to 0 with reward 2.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec


class NChainEnv(FuncEnv):
  """NChain-v0."""

  name = "NChain"

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"obs": ArraySpec(np.int32, (-1,), 0, 4)}

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 1)}

  @staticmethod
  def reset(cfg: Any, state: Any, key: jax.Array):
    del state, key
    return {"s": jnp.int32(0)}, jnp.int32(0), {}

  @classmethod
  def step(cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array):
    flip = jax.random.uniform(key, ()) < 0.2
    act = jnp.where(flip, 1 - action.astype(jnp.int32),
                    action.astype(jnp.int32))
    s = state["s"]
    back = act != 0
    at_end = s >= 4
    reward = jnp.where(
      back, 2.0, jnp.where(at_end, 10.0, 0.0)
    ).astype(jnp.float32)
    s = jnp.where(back, 0, jnp.where(at_end, s, s + 1))
    return {"s": s}, s.astype(jnp.int32), reward, jnp.bool_(False), {}
