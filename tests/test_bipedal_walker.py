"""BipedalWalker behavioral tests (determinism + env contract).

Counterpart of ``envpool/box2d/box2d_deterministic_test.py`` plus contract
checks; dynamics are a generalized-coordinate re-derivation, so the tests
pin behavior, not Box2D bit-patterns.
"""

import numpy as np

import envpool_tpu


def _run(task, seed, steps, num_envs=4, act=None):
  env = envpool_tpu.make_gymnasium(task, num_envs=num_envs, seed=seed)
  obs, _ = env.reset()
  o, r, d = [obs], [], []
  for t in range(steps):
    a = act(t) if act else np.zeros((num_envs, 4), np.float32)
    obs, rew, term, trunc, _ = env.step(a)
    o.append(obs)
    r.append(rew)
    d.append(term | trunc)
  return np.stack(o), np.stack(r), np.stack(d)


def test_spec() -> None:
  spec = envpool_tpu.make_spec("BipedalWalker-v3", num_envs=1)
  assert spec.state_array_spec["obs"].shape == (24,)
  assert spec.action_array_spec["action"].shape == (-1, 4)
  assert spec.config.max_episode_steps == 1600


def test_determinism_and_finiteness() -> None:
  o1, r1, _ = _run("BipedalWalker-v3", 3, 30)
  o2, r2, _ = _run("BipedalWalker-v3", 3, 30)
  o3, _, _ = _run("BipedalWalker-v3", 4, 30)
  np.testing.assert_array_equal(o1, o2)
  assert not np.array_equal(o1, o3)
  assert np.isfinite(o1).all() and np.isfinite(r1).all()
  # lidar fractions live in [0, 1]
  assert np.all((o1[..., 14:] >= 0) & (o1[..., 14:] <= 1))


def test_random_policy_falls_with_crash_penalty() -> None:
  rng = np.random.default_rng(0)
  obs, rew, done = _run(
    "BipedalWalker-v3", 5, 120, num_envs=8,
    act=lambda t: rng.uniform(-1, 1, (8, 4)).astype(np.float32),
  )
  ended = done.any(axis=0)
  assert ended.mean() >= 0.5  # flailing walkers mostly fall within 120 steps
  first = done.argmax(axis=0)
  term_rew = rew[first, np.arange(8)][ended]
  assert np.all(term_rew == -100.0)


def test_motors_move_joints() -> None:
  # with zero action the motor torque budget is 0 (|a| scales max torque)
  # so the hip drifts under gravity; holding hip1 action +1 drives the
  # joint positive at near the motor speed (SPEED_HIP/FPS per step),
  # clearly separated from the idle posture
  o_idle, _, _ = _run("BipedalWalker-v3", 9, 10)
  o_act, _, _ = _run(
    "BipedalWalker-v3", 9, 10,
    act=lambda t: np.tile(
      np.asarray([[1.0, 0, 0, 0]], np.float32), (4, 1)
    ),
  )
  assert np.all(o_act[10][:, 4] > 0.3)
  assert np.all(o_act[10][:, 4] > o_idle[10][:, 4] + 0.3)


def test_hardcore_variant() -> None:
  env = envpool_tpu.make_gymnasium(
    "BipedalWalkerHardcore-v3", num_envs=2, seed=0
  )
  obs, _ = env.reset()
  assert obs.shape == (2, 24)
  obs, rew, term, trunc, _ = env.step(np.zeros((2, 4), np.float32))
  assert np.isfinite(obs).all()
