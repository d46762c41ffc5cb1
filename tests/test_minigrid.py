"""MiniGrid Empty family tests (behavior + determinism, cf.
``envpool/minigrid/minigrid_test.py`` and ``minigrid_deterministic_test``)."""

import numpy as np

import envpool_tpu

T_EMPTY, T_WALL, T_GOAL = 1, 2, 8


def test_spec_and_reset() -> None:
  env = envpool_tpu.make_gymnasium("MiniGrid-Empty-8x8-v0", num_envs=3)
  obs, info = env.reset()
  assert obs["image"].shape == (3, 7, 7, 3)
  assert obs["image"].dtype == np.uint8
  np.testing.assert_array_equal(obs["direction"], 0)
  np.testing.assert_array_equal(info["agent_pos"], [[1, 1]] * 3)


def test_view_geometry() -> None:
  """At start (1,1) facing +x, the agent sits at the view's bottom-center
  column; behind-the-wall cells read as wall."""
  env = envpool_tpu.make_gymnasium("MiniGrid-Empty-8x8-v0", num_envs=1)
  obs, _ = env.reset()
  img = obs["image"][0]  # [x, y, 3] after the reference's transpose
  # the agent's own cell shows empty
  assert img[3, 6, 0] == T_EMPTY


def test_goal_reward_formula() -> None:
  """Drive straight to the goal: right turn + forwards; reward matches
  1 - 0.9 * steps / max_steps exactly (impl/minigrid_env.cc:83-84)."""
  env = envpool_tpu.make_gymnasium("MiniGrid-Empty-5x5-v0", num_envs=1)
  env.reset()
  # agent at (1,1) facing +x; goal at (3,3). forward x2 -> (3,1);
  # turn right (now +y); forward x2 -> (3,3)=goal
  acts = [2, 2, 1, 2, 2]
  for i, a in enumerate(acts):
    obs, rew, term, trunc, info = env.step(np.asarray([a], np.int32))
  assert term[0]
  expect = 1.0 - 0.9 * len(acts) / 100.0
  np.testing.assert_allclose(rew[0], expect, rtol=1e-6)


def test_walls_block() -> None:
  env = envpool_tpu.make_gymnasium("MiniGrid-Empty-5x5-v0", num_envs=1)
  _, info = env.reset()
  # face -x (two left turns) and try to walk into the wall
  env.step(np.asarray([0], np.int32))
  obs, rew, term, trunc, info = env.step(np.asarray([0], np.int32))
  obs, rew, term, trunc, info = env.step(np.asarray([2], np.int32))
  np.testing.assert_array_equal(info["agent_pos"], [[1, 1]])


def test_random_start_determinism() -> None:
  def starts(seed):
    env = envpool_tpu.make_gymnasium(
      "MiniGrid-Empty-Random-6x6-v0", num_envs=16, seed=seed
    )
    obs, info = env.reset()
    return np.asarray(info["agent_pos"]), np.asarray(obs["direction"])

  p1, d1 = starts(5)
  p2, d2 = starts(5)
  p3, d3 = starts(6)
  np.testing.assert_array_equal(p1, p2)
  np.testing.assert_array_equal(d1, d2)
  assert not (np.array_equal(p1, p3) and np.array_equal(d1, d3))
  # all starts are interior non-goal cells
  assert np.all((p1 >= 1) & (p1 <= 4))
  assert not np.any((p1[:, 0] == 4) & (p1[:, 1] == 4))
  assert np.all((d1 >= 0) & (d1 <= 3))


def test_truncation_at_max_steps() -> None:
  env = envpool_tpu.make_gymnasium(
    "MiniGrid-Empty-5x5-v0", num_envs=2, max_episode_steps=7
  )
  env.reset()
  for _ in range(6):
    _, _, term, trunc, _ = env.step(np.zeros(2, np.int32))
    assert not np.any(term | trunc)
  _, _, term, trunc, _ = env.step(np.zeros(2, np.int32))
  assert np.all(trunc)
