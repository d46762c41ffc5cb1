"""Dummy env — the heavily-commented developer template.

Counterpart of the reference's tutorial env
(``envpool/dummy/dummy_envpool.h:25-222``): not a real task, but the
smallest complete example of the environment-family contract, and a fixture
for the engine's API tests. Where the reference template demonstrates C++
virtual Reset/Step/IsDone plus state allocation, this one demonstrates the
pure-functional TPU contract of ``FuncEnv``:

  default_config() -> dict            env-specific config (merged with the
                                      common num_envs/seed/... config)
  state_spec(cfg)  -> {key: ArraySpec}  "obs"/"obs:x"/"info:x" keys
  action_spec(cfg) -> {key: ArraySpec}
  init(cfg, env_id, key) -> state     pre-first-reset state pytree
  reset(cfg, state, key) -> (state, obs, info)
  step(cfg, state, action, key) -> (state, obs, reward, term, info)

All functions are traced once and batched with vmap under jit: they see ONE
env's state (no batch dimension) and must be shape-static and functional.

Behavior (mirrors the observable behavior of the reference dummy): the env
counts steps; ``obs:raw`` is ``[state, action_taken]``; reward equals the
env's last action; an episode terminates after ``state_num`` steps.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec, ContainerSpec


class DummyEnv(FuncEnv):
  """Tutorial/dev-template env family (single- and multi-player)."""

  name = "Dummy"
  multi_player = True

  @staticmethod
  def default_config() -> Dict[str, Any]:
    # counterpart of DummyEnvFns::DefaultConfig (dummy_envpool.h:48-50);
    # container_obs enables the nested-dynamic obs:dyn demo field
    # (single-player only, cf. dummy_envpool.h:146-158)
    return {"state_num": 10, "action_num": 6, "container_obs": False}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    # two obs fields, a per-env info field, and a per-player info field
    # (leading -1), to exercise both paths (cf. the reference dummy's
    # players specs, dummy_envpool.h:77-84)
    spec: Dict[str, Any] = {
      "obs:raw": ArraySpec(np.int32, (2,)),
      "obs:clock": ArraySpec(np.float32, ()),
      "info:step_count": ArraySpec(np.int32, ()),
      "info:players.id": ArraySpec(np.int32, (-1,), 0, 100),
    }
    if getattr(cfg, "container_obs", False):
      # dynamic rows like the reference's {env_id+1, state_num} array
      spec["obs:dyn"] = ContainerSpec(
        ArraySpec(np.int32, (-1, int(cfg.state_num))),
        max_shape=(4, int(cfg.state_num)),
      )
    return spec

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, int(cfg.action_num) - 1)}

  @classmethod
  def init(cls, cfg: Any, env_id: jax.Array, key: jax.Array) -> Any:
    st, _, _ = cls.reset(cfg, {"env_id": env_id.astype(jnp.int32)}, key)
    return st

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array) -> Tuple[Any, Any, Dict]:
    del key
    env_id = state["env_id"] if isinstance(state, dict) else jnp.int32(0)
    st = {
      "env_id": env_id,
      "count": jnp.int32(0),
      "last_action": jnp.int32(-1),
    }
    p = int(cfg.max_num_players)
    if p > 1:
      # live player count varies per env, like the reference dummy
      st["num_players"] = env_id % p + 1
    return st, _obs(cfg, st), cls._info(cfg, st)

  @classmethod
  def step(
    cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array
  ) -> Tuple[Any, Any, jax.Array, jax.Array, Dict]:
    del key
    p = int(cfg.max_num_players)
    if p > 1:
      # padded per-player action [P]; reward echoes each player's action
      action = action.reshape(p).astype(jnp.int32)
      reward = action.astype(jnp.float32)
      first = action[0]
    else:
      action = action.reshape(()).astype(jnp.int32)
      reward = action.astype(jnp.float32)
      first = action
    st = dict(state, count=state["count"] + 1, last_action=first)
    term = st["count"] >= jnp.int32(cfg.state_num)
    return st, _obs(cfg, st), reward, term, cls._info(cfg, st)

  @staticmethod
  def _info(cfg: Any, st: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    p = int(cfg.max_num_players)
    players_id = jnp.arange(max(p, 1), dtype=jnp.int32)
    if p == 1:
      players_id = players_id[0]
    return {"step_count": st["count"], "players.id": players_id}


def _obs(cfg: Any, st: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
  obs = {
    "raw": jnp.stack([st["count"], st["last_action"]]),
    "clock": st["count"].astype(jnp.float32),
  }
  if getattr(cfg, "container_obs", False):
    # (padded data, actual shape): rows = env_id % 4 + 1 like the
    # reference's env_id+1 dynamic first dim, value = env_id
    sn = int(cfg.state_num)
    rows = st["env_id"] % 4 + 1
    data = jnp.full((4, sn), st["env_id"], jnp.int32)
    shape = jnp.stack([rows, jnp.int32(sn)]).astype(jnp.int32)
    obs["dyn"] = (data, shape)
  return obs
