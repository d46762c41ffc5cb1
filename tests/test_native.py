"""Native (C++) tier tests: parse parity and solver cross-check.

Counterpart of the reference's native-tier tests (its level loader and A*
are exercised through ``sokoban_py_envpool_test.py:118-150`` and the astar
binaries); here the ctypes library is compared against the pure-Python
implementations on the same inputs.
"""

import os

import numpy as np
import pytest

import envpool_tpu
from envpool_tpu import native
from envpool_tpu.envs.sokoban.astar import SokobanSolver
from envpool_tpu.envs.sokoban.level_loader import parse_level_file

LEVELS_DIR = os.path.join(
  os.path.dirname(envpool_tpu.__file__), "envs", "sokoban", "sample_levels"
)

needs_native = pytest.mark.skipif(
  not native.available(), reason="no C++ toolchain"
)


@needs_native
def test_parse_parity() -> None:
  for fname in ("000.txt", "001.txt", "small.txt"):
    path = os.path.join(LEVELS_DIR, fname)
    arr = native.parse_file(path, 10)
    py = np.stack(parse_level_file(path))
    np.testing.assert_array_equal(arr, py)


@needs_native
def test_solver_cross_check_and_env_replay() -> None:
  levels = parse_level_file(os.path.join(LEVELS_DIR, "small.txt"))
  solved = 0
  for idx, level in enumerate(levels):
    actions = native.solve(level, node_limit=500_000)
    py_actions, _ = SokobanSolver(level).solve(200_000)
    if actions is None or py_actions is None:
      continue
    # both A* searches must find equally-short solutions
    assert len(actions) == len(py_actions)
    solved += 1
    # the native solution must actually solve the env
    env = envpool_tpu.make_gymnasium(
      "Sokoban-v0", num_envs=1,
      max_episode_steps=len(actions) + 2,
      min_episode_steps=len(actions) + 2,
      levels_dir=os.path.join(LEVELS_DIR, "small.txt"),
      load_sequentially=True,
    )
    env.reset()
    for _ in range(idx):
      env.reset()
    for a in actions:
      _, rew, term, trunc, _ = env.step(np.asarray([a], np.int32))
    assert term[0] and rew[0] > 9.0
  assert solved > 0
