"""Determinism tests: same seed => identical trajectories, different seed
=> different. Mirrors ``envpool/box2d/box2d_deterministic_test.py:28-44``.
"""

import numpy as np
import pytest

import envpool_tpu

TASKS = [
  "CartPole-v1", "Pendulum-v1", "MountainCar-v0",
  "MountainCarContinuous-v0", "Acrobot-v1"
]


def _rollout(task: str, seed: int, steps: int = 200) -> np.ndarray:
  num_envs = 4
  env = envpool_tpu.make_gymnasium(task, num_envs=num_envs, seed=seed)
  env.reset()
  act_space = env.action_space
  rng = np.random.RandomState(0)
  obs_sum = []
  for _ in range(steps):
    if hasattr(act_space, "n"):
      act = rng.randint(0, act_space.n, num_envs).astype(np.int32)
    else:
      act = rng.uniform(
        act_space.low, act_space.high, (num_envs, *act_space.shape)
      ).astype(np.float32)
    obs, rew, term, trunc, info = env.step(act)
    obs_sum.append(obs.copy())
  return np.stack(obs_sum)


@pytest.mark.parametrize("task", TASKS)
def test_deterministic(task: str) -> None:
  t0 = _rollout(task, seed=0)
  t1 = _rollout(task, seed=0)
  t2 = _rollout(task, seed=1)
  np.testing.assert_array_equal(t0, t1)
  assert np.abs(t0 - t2).sum() > 0
