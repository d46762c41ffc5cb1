"""Sokoban — the fork's flagship family, as a pure-functional TPU env.

Parity targets (all in ``/root/reference/envpool/sokoban/``):
- push/move arena logic, box matching, reward
  (``sokoban_envpool.cc:85-167``): reward = reward_step +
  reward_box * (prev_unmatched - unmatched) + reward_finished if solved.
- negative action = noop with NaN reward that does not advance the
  internal step counter (``sokoban_envpool.cc:87-95``).
- per-episode step cap sampled uniform[min_episode_steps,
  max_episode_steps] (``sokoban_envpool.cc:31-34``).
- trunc: never truncated when solved; truncated when the cap ends an
  unsolved episode (``sokoban_envpool.cc:175-183``).
- reset-into-terminal-obs: on a terminal step the NEXT episode's level is
  loaded before the observation is written, so the terminal obs/info
  belong to the next episode (``sokoban_envpool.cc:198-202``) — expressed
  here through ``FuncEnv.env_resets``.
- obs = 3 x D x D uint8 RGB from the tiny-world palette
  (``sokoban_envpool.cc:171-177``).
- level streaming: sequential mode walks the concatenated (file-name
  sorted) level stream at positions env_id + k * num_envs, restarting
  after n_levels_to_load/num_envs levels per env
  (``level_loader.cc:180-216``); random mode picks a uniform file then a
  uniform level within it (the reference shuffles each file per env with
  its mt19937 — distributionally equivalent, not bit-identical).

TPU design: the whole level bank is a ``[n_levels, D, D]`` uint8 constant
in HBM; reset is a single dynamic gather from it, the step is ~30 fused
elementwise/scatter ops on a ``[num_envs, D, D]`` batch — no host traffic,
no per-env threads.
"""

from __future__ import annotations

import functools
import os
import tempfile
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from envpool_tpu.core.env import FuncEnv
from envpool_tpu.core.spec import ArraySpec

from .level_loader import (
  BOX,
  BOX_ON_TARGET,
  EMPTY,
  PLAYER,
  PLAYER_ON_TARGET,
  TARGET,
  WALL,
  LevelBank,
  generate_bank,
  load_bank,
)

# action codes (sokoban_envpool.h:31-35)
ACT_PUSH_UP, ACT_PUSH_DOWN, ACT_PUSH_LEFT, ACT_PUSH_RIGHT = range(4)
MAX_ACTION = ACT_PUSH_RIGHT

# Per-action (row, col) deltas. The reference's kChangeCoordinates
# {{0,-1},{0,1},{-1,0},{1,0}} are (x, y) pairs with x the COLUMN (its
# world is indexed ``world_.at(x + y * dim)``, sokoban_envpool.cc:69-74,
# :82-83); our world arrays are [row, col], so the same four actions
# up/down/left/right become:
_CHANGE_COORDINATES = np.asarray(
  [[-1, 0], [1, 0], [0, -1], [0, 1]], dtype=np.int32
)

# tiny-world RGB palette indexed by tile code (sokoban_envpool.cc:171-177)
TINY_COLORS = np.asarray(
  [
    [0, 0, 0],        # WALL
    [243, 248, 238],  # EMPTY
    [254, 126, 125],  # TARGET
    [254, 95, 56],    # BOX_ON_TARGET
    [142, 121, 56],   # BOX
    [160, 212, 56],   # PLAYER
    [219, 212, 56],   # PLAYER_ON_TARGET
  ],
  dtype=np.uint8,
)


@functools.lru_cache(maxsize=32)
def _bank_cached(
  levels_dir: str, dim_room: int, n_levels_to_load: int, seed: int
) -> LevelBank:
  if levels_dir:
    return load_bank(levels_dir, dim_room, -1)
  # no levels_dir: deterministic procedurally-generated bank, disk-cached
  # across processes (generation is ~5s; construction must stay cheap —
  # cache dir overridable via ENVPOOL_TPU_BANK_CACHE, "" disables)
  n = n_levels_to_load if n_levels_to_load > 0 else 1024
  cache_dir = os.environ.get(
    "ENVPOOL_TPU_BANK_CACHE",
    os.path.join(tempfile.gettempdir(), "envpool_tpu_banks"),
  )
  path = (
    os.path.join(cache_dir, f"bank_s{seed}_n{n}_d{dim_room}.npy")
    if cache_dir else ""
  )
  if path and os.path.exists(path):
    try:
      levels = np.load(path)
      return LevelBank(
        levels,
        np.zeros(n, dtype=np.int32),
        np.arange(n, dtype=np.int32),
        ["<generated>"],
      )
    except Exception:
      pass  # corrupt cache: regenerate below
  bank = generate_bank(seed, n, dim_room=dim_room)
  if path:
    try:
      os.makedirs(cache_dir, exist_ok=True)
      tmp = path + f".tmp{os.getpid()}"
      with open(tmp, "wb") as f:  # np.save(path) would append ".npy"
        np.save(f, bank.levels)
      os.replace(tmp, path)
    except OSError:
      pass  # unwritable cache dir: run uncached
  return bank


def _get_bank(cfg: Any) -> LevelBank:
  return _bank_cached(
    str(cfg.levels_dir), int(cfg.dim_room),
    int(cfg.n_levels_to_load), int(cfg.seed)
  )


class SokobanEnv(FuncEnv):
  """Sokoban-v0."""

  name = "Sokoban"
  env_resets = True

  @staticmethod
  def default_config() -> Dict[str, Any]:
    # defaults of SokobanEnvFns::DefaultConfig (sokoban_envpool.h:40-48)
    return {
      "reward_finished": 10.0,
      "reward_box": 1.0,
      "reward_step": -0.1,
      "dim_room": 10,
      "levels_dir": "",
      "verbose": 0,
      "min_episode_steps": 0,
      "load_sequentially": False,
      "n_levels_to_load": -1,
    }

  @staticmethod
  def state_spec(cfg: Any) -> Dict[str, ArraySpec]:
    d = int(cfg.dim_room)
    return {
      "obs": ArraySpec(np.uint8, (3, d, d)),
      "info:level_file_idx": ArraySpec(np.int32, (-1,)),
      "info:level_idx": ArraySpec(np.int32, (-1,)),
    }

  @staticmethod
  def action_spec(cfg: Any) -> Dict[str, ArraySpec]:
    return {"action": ArraySpec(np.int32, (-1,), 0, MAX_ACTION)}

  # ----------------------------------------------------------------- helpers

  @classmethod
  def _load_level(
    cls, cfg: Any, cursor: jax.Array, key: jax.Array
  ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Pick the next level -> (world, file_idx, level_idx, new_cursor).

    ``cursor`` is this env's flat-stream position (already includes env_id).

    TPU note: the bank row fetch is a one-hot MATMUL, not a gather —
    vmapped row gathers serialize on TPU and dominated the family's step
    time (3.2 of 3.6 ms/step at 16k envs); as a [n_envs, n_levels] x
    [n_levels, dim*dim+2] f32 GEMM it rides the MXU in microseconds.
    Level tiles (0..6) and indices are exact in f32.
    """
    bank = _get_bank(cfg)
    d = int(cfg.dim_room)
    n = bank.n_levels
    # tiles in bf16 (values 0..6 and a one-nonzero dot are exact there;
    # bf16 keeps the GEMM on the fast MXU path), indices in f32
    tiles = jnp.asarray(
      bank.levels.reshape(n, d * d).astype(np.float32)
    ).astype(jnp.bfloat16)
    idx_table = jnp.asarray(
      np.stack([bank.file_idx, bank.level_idx], axis=1).astype(np.float32)
    )
    if bool(cfg.load_sequentially):
      n_load = int(cfg.n_levels_to_load)
      n_eff = n_load if 0 < n_load <= n else n
      flat = jnp.mod(cursor, n_eff)
      new_cursor = cursor + jnp.int32(cfg.num_envs)
    else:
      kf, kl = jax.random.split(key)
      n_files = len(bank.file_start)
      f = jax.random.randint(kf, (), 0, n_files)
      f_onehot = (jnp.arange(n_files) == f).astype(jnp.float32)
      bounds = f_onehot @ jnp.asarray(
        np.stack([bank.file_start, bank.file_len], axis=1).astype(np.float32)
      )
      start = bounds[0].astype(jnp.int32)
      length = bounds[1].astype(jnp.int32)
      l = jax.random.randint(kl, (), 0, jnp.int32(2 ** 30)) % length
      flat = start + l
      new_cursor = cursor
    onehot = jnp.arange(n) == flat
    world = (
      onehot.astype(jnp.bfloat16) @ tiles
    ).reshape(d, d).astype(jnp.uint8)
    idx_row = onehot.astype(jnp.float32) @ idx_table
    return (
      world,
      idx_row[0].astype(jnp.int32),
      idx_row[1].astype(jnp.int32),
      new_cursor,
    )

  @staticmethod
  def _sample_cap(cfg: Any, key: jax.Array) -> jax.Array:
    """uniform[min_episode_steps, max_episode_steps] per episode."""
    lo = int(cfg.min_episode_steps)
    hi = int(cfg.max_episode_steps)
    if lo >= hi:
      return jnp.int32(hi)
    # span fits uint32 even for hi = int32 max; modulo pick avoids overflow
    span = np.uint32(hi - lo + 1)
    bits = jax.random.bits(key, (), jnp.uint32)
    return jnp.int32(lo) + (bits % span).astype(jnp.int32)

  @classmethod
  def _fresh_episode(
    cls, cfg: Any, cursor: jax.Array, key: jax.Array
  ) -> Dict[str, jax.Array]:
    klvl, kcap = jax.random.split(key)
    world, fidx, lidx, cursor2 = cls._load_level(cfg, cursor, klvl)
    d = world.shape[0]
    flat_pos = jnp.argmax(
      ((world == PLAYER) | (world == PLAYER_ON_TARGET)).ravel()
    ).astype(jnp.int32)
    player = jnp.stack([flat_pos // d, flat_pos % d])
    unmatched = jnp.sum(world == BOX).astype(jnp.int32)
    return {
      "world": world,
      "player": player,
      "unmatched": unmatched,
      "steps": jnp.int32(0),
      "cap": cls._sample_cap(cfg, kcap),
      "cursor": cursor2,
      "file_idx": fidx,
      "level_idx": lidx,
    }

  # ------------------------------------------------------------------- hooks

  @classmethod
  def init(cls, cfg: Any, env_id: jax.Array, key: jax.Array) -> Any:
    # Like the reference constructor, init does NOT consume a level — the
    # first Reset does (``level_loader.cc:36``: cur_level_ starts at env_id,
    # advancing by num_envs per episode, :208-210). The stub world below is
    # never observed: the pool auto-resets every lane on its first step.
    d = int(cfg.dim_room)
    return {
      "world": jnp.full((d, d), WALL, dtype=jnp.uint8),
      "player": jnp.zeros(2, jnp.int32),
      "unmatched": jnp.int32(1),
      "steps": jnp.int32(0),
      "cap": jnp.int32(1),
      "cursor": env_id.astype(jnp.int32),
      "file_idx": jnp.int32(-1),
      "level_idx": jnp.int32(-1),
    }

  @classmethod
  def reset(cls, cfg: Any, state: Any, key: jax.Array) -> Tuple[Any, Any, Dict]:
    new = cls._fresh_episode(cfg, state["cursor"], key)
    info = dict(cls._info(new), elapsed_step=jnp.int32(0))
    return new, cls._render(new["world"]), info

  @classmethod
  def step(
    cls, cfg: Any, state: Any, action: jax.Array, key: jax.Array
  ) -> Tuple[Any, Any, jax.Array, jax.Array, jax.Array, Dict]:
    d = int(cfg.dim_room)
    world = state["world"]
    action = action.reshape(())
    noop = action < 0
    a_onehot = (
      jnp.arange(4) == jnp.clip(action, 0, MAX_ACTION)
    ).astype(jnp.int32)
    delta = a_onehot @ jnp.asarray(_CHANGE_COORDINATES)

    p0 = state["player"]
    p1 = p0 + delta
    p2 = p0 + 2 * delta

    # TPU notes: (a) all cell reads/writes below are one-hot mask
    # arithmetic over the grid instead of dynamic gathers/scatters —
    # vmapped scatter serializes on TPU and was the family's throughput
    # ceiling; (b) the grid is FLATTENED to [d*d] for the arithmetic: a
    # [10, 10] minor shape pads to an (8, 128) vreg tile (10x wasted
    # lanes), a [100] vector pads only to 128.
    wf = world.reshape(d * d)
    rng_f = jnp.arange(d * d)

    def flat_pos(p: jax.Array) -> jax.Array:
      # -1 for out-of-bounds (matches nothing in rng_f)
      inb = (p[0] >= 0) & (p[0] < d) & (p[1] >= 0) & (p[1] < d)
      return jnp.where(inb, p[0] * d + p[1], -1)

    m0 = rng_f == flat_pos(p0)
    m1 = rng_f == flat_pos(p1)
    m2 = rng_f == flat_pos(p2)

    def world_at(m: jax.Array) -> jax.Array:
      # out-of-bounds reads as WALL (sokoban_envpool.cc:69-74); the empty
      # mask sums to 0 == kWall, which is exactly that semantics
      return jnp.sum(jnp.where(m, wf, 0).astype(jnp.int32)).astype(
        jnp.uint8
      )

    a0, a1, a2 = world_at(m0), world_at(m1), world_at(m2)
    box_moves = (
      ((a1 == BOX) | (a1 == BOX_ON_TARGET)) &
      ((a2 == EMPTY) | (a2 == TARGET))
    )
    agent_moves = (a1 == EMPTY) | (a1 == TARGET) | box_moves

    def is_target(a: jax.Array) -> jax.Array:
      return (a == BOX_ON_TARGET) | (a == TARGET) | (a == PLAYER_ON_TARGET)

    t0, t1, t2 = is_target(a0), is_target(a1), is_target(a2)
    new0 = jnp.where(t0, TARGET, EMPTY).astype(jnp.uint8)
    new1 = jnp.where(t1, PLAYER_ON_TARGET, PLAYER).astype(jnp.uint8)
    new2 = jnp.where(
      box_moves,
      jnp.where(t2, BOX_ON_TARGET, BOX),
      a2,
    ).astype(jnp.uint8)

    # masked writes; an out-of-bounds p2 has an empty mask (drop semantics)
    moved = jnp.where(m0, new0, jnp.where(m1, new1, jnp.where(m2, new2,
                                                              wf)))
    do_move = agent_moves & ~noop
    world2 = jnp.where(do_move, moved, wf).reshape(d, d)
    player2 = jnp.where(do_move, p1, p0)
    d_unmatched = jnp.where(
      box_moves & do_move,
      t1.astype(jnp.int32) - t2.astype(jnp.int32),
      0,
    )
    unmatched2 = state["unmatched"] + d_unmatched
    steps2 = state["steps"] + jnp.where(noop, 0, 1)

    solved = unmatched2 == 0
    reward = (
      jnp.float32(cfg.reward_step) +
      jnp.float32(cfg.reward_box) * (-d_unmatched).astype(jnp.float32) +
      jnp.where(solved, jnp.float32(cfg.reward_finished), 0.0)
    )
    reward = jnp.where(noop, jnp.float32(jnp.nan), reward)
    done = solved | (steps2 >= state["cap"])
    trunc = jnp.where(solved, False, done)

    stepped = dict(
      state,
      world=world2,
      player=player2,
      unmatched=unmatched2,
      steps=steps2,
    )
    # reset-into-terminal-obs: load the next episode NOW if done, so the
    # terminal observation/info already belong to the next episode
    # (sokoban_envpool.cc:198-202).
    fresh = cls._fresh_episode(cfg, state["cursor"], key)
    out = jax.tree_util.tree_map(
      lambda a, b: jnp.where(done, a, b), fresh, stepped
    )
    # elapsed_step reports the FINISHING episode's counter even on the
    # terminal step (the reference writes it before ResetWithoutWrite,
    # sokoban_envpool.cc:177-216); noops already left steps2 unchanged.
    info = dict(cls._info(out), elapsed_step=steps2)
    return out, cls._render(out["world"]), reward, done, trunc, info

  @staticmethod
  def _render(world: jax.Array) -> jax.Array:
    """[D, D] tile codes -> [3, D, D] uint8 RGB via palette lookup.

    One-hot mask arithmetic instead of a table gather: TPU lowers tiny
    minor-dim gathers to serialized loops, and this is the per-step obs
    hot path.
    """
    acc = jnp.zeros((3, *world.shape), jnp.uint8)
    for tile in range(len(TINY_COLORS)):
      m = world == tile
      color = jnp.asarray(TINY_COLORS[tile], jnp.uint8)
      acc = jnp.where(m[None, :, :], color[:, None, None], acc)
    return acc

  @staticmethod
  def _info(state: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    return {
      "level_file_idx": state["file_idx"],
      "level_idx": state["level_idx"],
    }
