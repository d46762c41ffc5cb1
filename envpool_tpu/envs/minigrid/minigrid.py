"""MiniGrid Empty family — pure-functional JAX rewrite.

Parity target: ``envpool/minigrid/`` (C++ impl of the MiniGrid "Empty"
environments). Semantics reproduced:

- 7 actions left/right/forward/pickup/drop/toggle/done; only the first
  three do anything in Empty rooms (``impl/minigrid_env.cc:44-126``);
- reward ``1 - 0.9 * step_count / max_steps`` on reaching the goal,
  0 otherwise; stepping into lava ends the episode (no lava in Empty)
  (``impl/minigrid_env.cc:83-87``);
- grid: surrounding grey walls, green goal at (width-2, height-2), agent
  at the configured start pos/dir or randomly placed on an empty cell
  with random direction when configured as (-1, -1)/-1
  (``impl/minigrid_empty_env.cc:35-63``, ``impl/minigrid_env.cc:132-156``);
- obs: ``direction`` plus the agent-view partial image
  [view, view, 3] uint8 of (type, color, state), rotated to face up,
  out-of-grid cells read as walls, the agent's own cell shows what it
  carries (empty here), transposed to match the python library
  (``impl/minigrid_env.cc:158-239``);
- info:agent_pos.

TPU design: the Empty grid is static, so env state is just (pos, dir,
step_count); the partial view is a gather from a padded constant type map
plus a 4-way rotation select — a handful of fused ops per step.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

# Act enum (impl/utils.h:24-37)
ACT_LEFT, ACT_RIGHT, ACT_FORWARD = 0, 1, 2
# Type enum (impl/utils.h:48-60)
T_EMPTY, T_WALL, T_GOAL = 1, 2, 8
# Color enum (impl/utils.h:39-46): empty->red, wall->grey, goal->green
TYPE_COLOR = np.zeros(11, dtype=np.uint8)
TYPE_COLOR[T_EMPTY] = 0
TYPE_COLOR[T_WALL] = 5
TYPE_COLOR[T_GOAL] = 1

# forward offsets per direction: 0:+x, 1:+y, 2:-x, 3:-y
_FWD = np.asarray([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.int32)


@functools.lru_cache(maxsize=32)
def _grid_np(size: int, view: int) -> np.ndarray:
  """Padded [size+2v, size+2v] type map; pad reads as wall."""
  g = np.full((size, size), T_EMPTY, dtype=np.uint8)
  g[0, :] = g[-1, :] = T_WALL
  g[:, 0] = g[:, -1] = T_WALL
  g[size - 2, size - 2] = T_GOAL  # grid[y][x]; goal at x=w-2, y=h-2
  return np.pad(g, view, constant_values=T_WALL)


class EmptyEnv(FuncEnv):
  """MiniGrid-Empty-*."""

  name = "Empty"

  @staticmethod
  def default_config() -> Dict[str, Any]:
    # empty.h:31-35; agent_start_pos flattened to two config ints
    return {
      "size": 8,
      "agent_start_pos_x": 1,
      "agent_start_pos_y": 1,
      "agent_start_dir": 0,
      "agent_view_size": 7,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    v = int(cfg.agent_view_size)
    return {
      "obs:direction": ArraySpec(np.int32, (-1,), 0, 3),
      "obs:image": ArraySpec(np.uint8, (v, v, 3), 0, 255),
      "info:agent_pos": ArraySpec(np.int32, (2,), 0, int(cfg.size)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, 6)}

  # ------------------------------------------------------------------ hooks

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array) -> Tuple[Any, Any, Dict]:
    del state
    size = int(cfg.size)
    sx, sy = int(cfg.agent_start_pos_x), int(cfg.agent_start_pos_y)
    sdir = int(cfg.agent_start_dir)
    if sx == -1:
      # random placement on an empty interior cell: uniform over the
      # (size-2)^2 - 1 non-goal cells (rejection-equivalent,
      # impl/minigrid_env.cc:132-150)
      kp, kd = jax.random.split(key)
      n_int = (size - 2) * (size - 2)
      goal_idx = n_int - 1  # (x=size-2, y=size-2) is last interior cell
      j = jax.random.randint(kp, (), 0, n_int - 1)
      j = jnp.where(j >= goal_idx, j + 1, j)
      pos = jnp.stack([j % (size - 2) + 1, j // (size - 2) + 1]).astype(
        jnp.int32
      )
      direction = (
        jax.random.randint(kd, (), 0, 4).astype(jnp.int32)
        if sdir == -1 else jnp.int32(sdir)
      )
    else:
      pos = jnp.asarray([sx, sy], jnp.int32)
      direction = jnp.int32(sdir)
    st = {"pos": pos, "dir": direction, "steps": jnp.int32(0)}
    return st, cls._obs(cfg, st), {"agent_pos": pos}

  @classmethod
  def step(
    cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array
  ) -> Tuple[Any, Any, jax.Array, jax.Array, Dict]:
    del key
    size = int(cfg.size)
    view = int(cfg.agent_view_size)
    grid = jnp.asarray(_grid_np(size, view))
    action = action.reshape(())
    pos, direction = state["pos"], state["dir"]
    steps = state["steps"] + 1

    fwd = pos + jnp.asarray(_FWD)[direction]
    fwd_type = grid[fwd[1] + view, fwd[0] + view]

    direction = jnp.where(
      action == ACT_LEFT, (direction + 3) % 4,
      jnp.where(action == ACT_RIGHT, (direction + 1) % 4, direction),
    )
    is_fwd = action == ACT_FORWARD
    can_overlap = (fwd_type == T_EMPTY) | (fwd_type == T_GOAL)
    pos = jnp.where(is_fwd & can_overlap, fwd, pos)
    reached_goal = is_fwd & (fwd_type == T_GOAL)
    reward = jnp.where(
      reached_goal,
      1.0 - 0.9 * steps.astype(jnp.float32)
      / jnp.float32(cfg.max_episode_steps),
      0.0,
    ).astype(jnp.float32)
    term = reached_goal

    st = {"pos": pos, "dir": direction, "steps": steps}
    return st, cls._obs(cfg, st), reward, term, {"agent_pos": pos}

  # ------------------------------------------------------------------- image

  @classmethod
  def _obs(cls, cfg: Any, st: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    size = int(cfg.size)
    view = int(cfg.agent_view_size)
    grid = jnp.asarray(_grid_np(size, view))
    pos, direction = st["pos"], st["dir"]

    # top-left corner of the view in grid coords per direction
    # (impl/minigrid_env.cc:160-177)
    half = view // 2
    tops = jnp.stack([
      jnp.stack([pos[0], pos[1] - half]),
      jnp.stack([pos[0] - half, pos[1]]),
      jnp.stack([pos[0] - view + 1, pos[1] - half]),
      jnp.stack([pos[0] - half, pos[1] - view + 1]),
    ])
    top = tops[direction]
    # window extraction as two one-hot matmuls (a vmapped dynamic_slice
    # with per-env starts lowers to TPU's serialized gather): rows
    # [view, G] @ grid [G, G] @ cols [G, view]
    g = grid.shape[0]
    row0 = top[1] + view
    col0 = top[0] + view
    rsel = (
      jnp.arange(view)[:, None] + row0 == jnp.arange(g)[None, :]
    ).astype(jnp.float32)
    csel = (
      jnp.arange(g)[:, None] == jnp.arange(view)[None, :] + col0
    ).astype(jnp.float32)
    window = (rsel @ grid.astype(jnp.float32) @ csel).astype(jnp.uint8)

    # rotate counter-clockwise (dir + 1) times (impl/minigrid_env.cc:195-205):
    # copy[v-1-x][y] = win[y][x]  ==  np.rot90(win, k=-1) per application
    rots = [window]
    for _ in range(3):
      rots.append(jnp.rot90(rots[-1], k=-1))
    # 4-way select by direction via masked adds (no per-env table gather)
    rotated = (
      jnp.where(direction == 0, rots[1], 0)
      + jnp.where(direction == 1, rots[2], 0)
      + jnp.where(direction == 2, rots[3], 0)
      + jnp.where(direction == 3, rots[0], 0)
    ).astype(jnp.uint8)

    # the agent's own cell shows what it carries (nothing -> empty)
    rotated = rotated.at[view - 1, view // 2].set(T_EMPTY)

    # color channel via masked selects (tiny-table gathers serialize on TPU)
    color = jnp.zeros_like(rotated)
    for t, c in ((T_EMPTY, TYPE_COLOR[T_EMPTY]),
                 (T_WALL, TYPE_COLOR[T_WALL]),
                 (T_GOAL, TYPE_COLOR[T_GOAL])):
      color = jnp.where(rotated == t, jnp.uint8(c), color)
    img = jnp.stack([
      rotated,
      color,
      jnp.zeros_like(rotated),
    ], axis=-1).astype(jnp.uint8)
    # transpose obs(x, y, c) = view[y][x] (impl/minigrid_env.cc:231-236)
    img = jnp.transpose(img, (1, 0, 2))
    return {"direction": direction, "image": img}
