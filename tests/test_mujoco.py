"""MuJoCo gym family tests.

Mirrors the reference's taxonomy: spec checks
(``envpool/mujoco/gym/*_test``), determinism
(``mujoco_gym_deterministic_test.py``), and alignment against the original
python envs stepped from identical physics state
(``mujoco_gym_align_test.py:42-60`` — there via ENVPOOL_TEST qpos0/qvel0;
here by copying qpos/qvel directly into a gymnasium env).
"""

import numpy as np
import pytest

import envpool_tpu

TASK_OBS = {
  "Ant-v4": 27,
  "HalfCheetah-v4": 17,
  "Hopper-v4": 11,
  "Walker2d-v4": 17,
  "Swimmer-v4": 8,
  "Reacher-v4": 11,
  "Pusher-v4": 23,
  "InvertedPendulum-v4": 4,
  "InvertedDoublePendulum-v4": 11,
  "Humanoid-v4": 376,
  "HumanoidStandup-v4": 376,
}


@pytest.mark.parametrize("task,obs_n", sorted(TASK_OBS.items()))
def test_spec_obs_size(task, obs_n) -> None:
  spec = envpool_tpu.make_spec(task, num_envs=1)
  assert spec.state_array_spec["obs"].shape == (obs_n,)


def test_reset_and_step_all() -> None:
  for task, obs_n in sorted(TASK_OBS.items()):
    env = envpool_tpu.make_gymnasium(task, num_envs=2, seed=0)
    obs, info = env.reset()
    assert obs.shape == (2, obs_n), task
    act_shape = env.action_space.shape
    obs, rew, term, trunc, info = env.step(np.zeros((2, *act_shape)))
    assert obs.shape == (2, obs_n), task
    assert np.isfinite(rew).all(), task


def test_determinism() -> None:
  def traj(seed):
    env = envpool_tpu.make_gymnasium("Hopper-v4", num_envs=4, seed=seed)
    obs, _ = env.reset()
    out = [obs]
    for _ in range(20):
      obs, rew, *_ = env.step(np.full((4, 3), 0.1))
      out.append(obs)
    return np.stack(out)

  t1, t2, t3 = traj(11), traj(11), traj(12)
  np.testing.assert_array_equal(t1, t2)
  assert not np.array_equal(t1, t3)


@pytest.mark.parametrize("task,act_n", [
  ("Ant-v4", 8), ("HalfCheetah-v4", 6), ("Hopper-v4", 3),
  ("Walker2d-v4", 6), ("Swimmer-v4", 2),
])
def test_align_with_gymnasium(task, act_n) -> None:
  """Step ours and gymnasium's env from identical (qpos, qvel)."""
  import gymnasium

  ours = envpool_tpu.make_gymnasium(task, num_envs=1, seed=7)
  ours.reset()
  inner = ours._envs[0]
  ref = gymnasium.make(task).unwrapped
  ref.reset()
  ref.set_state(np.copy(inner.data.qpos), np.copy(inner.data.qvel))

  rng = np.random.default_rng(0)
  for t in range(20):
    act = rng.uniform(-0.5, 0.5, act_n)
    obs, rew, term, trunc, info = ours.step(act[None])
    robs, rrew, rterm, rtrunc, rinfo = ref.step(act)
    np.testing.assert_allclose(obs[0], robs, rtol=1e-9, atol=1e-9,
                               err_msg=f"{task} obs step {t}")
    np.testing.assert_allclose(rew[0], rrew, rtol=1e-7, atol=1e-9,
                               err_msg=f"{task} reward step {t}")
    assert bool(term[0]) == bool(rterm)
    if rterm or rtrunc:
      break


def test_time_limit_truncation() -> None:
  env = envpool_tpu.make_gymnasium(
    "HalfCheetah-v4", num_envs=2, seed=0, max_episode_steps=5
  )
  env.reset()
  for _ in range(4):
    _, _, term, trunc, _ = env.step(np.zeros((2, 6)))
    assert not np.any(term | trunc)
  _, _, term, trunc, _ = env.step(np.zeros((2, 6)))
  assert np.all(trunc) and not np.any(term)
