"""Functional environment interface — the TPU-native `Env<Spec>` counterpart.

Reference model: a stateful C++ class per env with virtual Reset/Step/IsDone
(``envpool/core/env.h:62-223``) whose instances live on worker threads. Here an
environment family is a *pure-functional* bundle of JAX-traceable functions
over an explicit state pytree; the pool batches them with ``vmap`` under
``jit`` so all ``num_envs`` instances step as one fused XLA program.

Contract (all functions must be jax-traceable and shape-static):

  default_config() -> dict                      # env-specific config defaults
  state_spec(cfg)  -> {name: ArraySpec}         # "obs"/"obs:x"/"info:x" keys
  action_spec(cfg) -> {name: ArraySpec}         # usually a single "action"
  init(cfg, env_id, key) -> state               # pre-first-reset state pytree
  reset(cfg, state, key) -> (state, obs, info)
  step(cfg, state, action, key) -> (state, obs, reward, term, info)

``obs`` is a single array when the state spec has one "obs" key, otherwise a
dict keyed without the "obs:" prefix. ``info`` is a dict matching the
"info:..." spec keys (or empty). ``term`` is environment-termination only;
time-limit truncation is applied by the pool using ``episode_cap``.

Common config / common state-field semantics reproduce
``envpool/core/env_spec.h:26-43`` and ``envpool/core/env.h:196-222``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spec import ArraySpec

# Common config, same keys/defaults/order as the reference
# (``envpool/core/env_spec.h:26-31``). num_threads / thread_affinity_offset
# are accepted for API compatibility; threads are an XLA concern here.
COMMON_CONFIG: Dict[str, Any] = {
  "num_envs": 1,
  "batch_size": 0,
  "num_threads": 0,
  "max_num_players": 1,
  "thread_affinity_offset": -1,
  "base_path": "envpool_tpu",
  "seed": 42,
  "gym_reset_return_info": False,
  "max_episode_steps": np.iinfo(np.int32).max,
}

# Common action / state specs (``envpool/core/env_spec.h:34-43``).


def common_action_spec() -> Dict[str, ArraySpec]:
  return {
    "env_id": ArraySpec(np.int32, ()),
    "players.env_id": ArraySpec(np.int32, (-1,)),
  }


def common_state_spec() -> Dict[str, ArraySpec]:
  return {
    "info:env_id": ArraySpec(np.int32, ()),
    "info:players.env_id": ArraySpec(np.int32, (-1,)),
    "elapsed_step": ArraySpec(np.int32, ()),
    "done": ArraySpec(np.bool_, ()),
    "reward": ArraySpec(np.float32, (-1,)),
    "discount": ArraySpec(np.float32, (-1,), 0.0, 1.0),
    "step_type": ArraySpec(np.int32, ()),
    "trunc": ArraySpec(np.bool_, ()),
  }


class FuncEnv:
  """Base class for functional env families.

  Subclasses override the static methods documented in the module docstring.
  They are *namespaces*, never instantiated with per-env state.
  """

  #: capitalized family name used to synthesize class names, e.g. "CartPole"
  name: str = "Func"

  #: env-side auto-reset ("reset-into-terminal-obs"). When True, ``step``
  #: returns ``(state, obs, reward, done, trunc, info)`` where, on a terminal
  #: transition, ``state``/``obs`` are ALREADY the next episode's initial
  #: state/obs and ``done``/``trunc`` are computed by the env itself. The pool
  #: then never schedules a pool-level auto-reset — reproducing the reference
  #: Sokoban semantics where ``WriteState`` resets the world before writing
  #: the terminal observation (``envpool/sokoban/sokoban_envpool.cc:198-202``)
  #: so ``IsDone()`` is already false at the next scheduled step. Because the
  #: pool cannot see the in-step resets (nor noops that freeze the counter),
  #: such envs report their own step counter through the reserved info key
  #: ``"elapsed_step"`` in both ``reset`` and ``step`` infos; on a terminal
  #: step it must be the FINISHING episode's count, exactly as the reference
  #: writes ``elapsed_step = current_step_`` before ``ResetWithoutWrite``
  #: (``sokoban_envpool.cc:177-216``, ``env.h:209``).
  env_resets: bool = False

  #: static-shape multiplayer support (SURVEY P6). When True and the pool
  #: is built with max_num_players > 1: per-player spec fields (leading
  #: -1 dims) are padded to max_num_players, the env keeps the live count
  #: in ``state["num_players"]``, ``step`` receives padded per-player
  #: action arrays and returns a padded per-player reward vector. The
  #: pool masks rewards/discounts and the host boundary compacts padding
  #: (the reference instead packs players dynamically,
  #: ``envpool/core/env.h:124-159``, ``state_buffer.h:87-93``).
  multi_player: bool = False

  @staticmethod
  def default_config() -> Dict[str, Any]:
    return {}

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    raise NotImplementedError

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    raise NotImplementedError

  @classmethod
  def init(cls, cfg: Any, env_id: jax.Array, key: jax.Array) -> Any:
    """Default: the state produced by a reset from nothing."""
    del env_id
    state, _, _ = cls.reset(cfg, None, key)
    return state

  @staticmethod
  def reset(cfg: Any, state: Any, key: jax.Array) -> Tuple[Any, Any, Dict]:
    raise NotImplementedError

  @staticmethod
  def step(
    cfg: Any, state: Any, action: Any, key: jax.Array
  ) -> Tuple[Any, Any, jax.Array, jax.Array, Dict]:
    raise NotImplementedError

  @staticmethod
  def episode_cap(cfg: Any, state: Any) -> Any:
    """Per-episode step cap; envs may override (e.g. sokoban samples it)."""
    return jnp.int32(cfg.max_episode_steps)
