"""Box2D LunarLander behavioral tests.

The reference asserts bit-determinism and smoke behavior for box2d
(``envpool/box2d/box2d_deterministic_test.py:28-44``); since our dynamics
are a JAX re-derivation (not the Box2D solver), the tests here check
determinism plus the env's behavioral contract: gravity pulls the lander
down, the main engine brakes the fall, hull contact crashes with -100,
successful rest yields +100, obs layout/scaling matches the reference.
"""

import numpy as np

import envpool_tpu


def _run(task, seed, steps=120, action_fn=None, num_envs=8):
  env = envpool_tpu.make(
    task, env_type="gymnasium", num_envs=num_envs, seed=seed
  )
  obs, _ = env.reset()
  traj_obs, traj_rew, traj_done = [obs], [], []
  for t in range(steps):
    if action_fn is None:
      act = np.zeros(num_envs, np.int32)
    else:
      act = action_fn(t, obs)
    obs, rew, term, trunc, _ = env.step(act)
    traj_obs.append(obs)
    traj_rew.append(rew)
    traj_done.append(term | trunc)
  return np.stack(traj_obs), np.stack(traj_rew), np.stack(traj_done)


def test_determinism() -> None:
  o1, r1, d1 = _run("LunarLander-v2", seed=7, steps=50)
  o2, r2, d2 = _run("LunarLander-v2", seed=7, steps=50)
  o3, _, _ = _run("LunarLander-v2", seed=8, steps=50)
  np.testing.assert_array_equal(o1, o2)
  np.testing.assert_array_equal(r1, r2)
  assert not np.array_equal(o1, o3)


def test_gravity_and_obs_layout() -> None:
  obs, rew, done = _run("LunarLander-v2", seed=1, steps=12)
  # gravity: while airborne with engines off, vy (obs[3]) decreases
  # monotonically (the initial uniform(-1000,1000) kick can make some
  # landers rise at first — same as the reference, lunar_lander_env.cc:
  # 140-145 — so the HEIGHT need not decrease yet).
  first, later = obs[0], obs[10]
  airborne = ~done[:10].any(axis=0)
  assert airborne.any()
  assert np.all(later[airborne, 3] < first[airborne, 3])
  # height above helipad starts around 1.4 in obs scaling
  assert np.all(np.abs(first[:, 1] - 1.41) < 0.1)
  assert obs.shape[-1] == 8


def test_main_engine_brakes_fall() -> None:
  # free fall vs constant main engine: engine-on vy must be higher
  _, _, _ = _run("LunarLander-v2", seed=3, steps=1)
  o_off, _, d_off = _run("LunarLander-v2", seed=3, steps=30)
  o_on, _, d_on = _run(
    "LunarLander-v2", seed=3, steps=30,
    action_fn=lambda t, o: np.full(8, 2, np.int32),
  )
  m = ~(d_off[:29].any(axis=0) | d_on[:29].any(axis=0))
  assert m.any()
  assert np.mean(o_on[30][m, 3] - o_off[30][m, 3] > 0) > 0.7


def test_crash_gives_minus_100() -> None:
  # dropping with no control ends episodes; terminal reward -100 (crash)
  # or +100 (lucky soft landing at rest)
  obs, rew, done = _run("LunarLander-v2", seed=5, steps=400, num_envs=16)
  first_done = done.argmax(axis=0)
  ended = done.any(axis=0)
  assert ended.mean() > 0.8
  terminal_rewards = rew[first_done, np.arange(rew.shape[1])][ended]
  assert np.all(
    (np.abs(terminal_rewards - (-100.0)) < 1e-4)
    | (np.abs(terminal_rewards - 100.0) < 1e-4)
  )


def test_continuous_action_space() -> None:
  env = envpool_tpu.make(
    "LunarLanderContinuous-v2", env_type="gymnasium", num_envs=4, seed=0
  )
  assert env.action_space.shape == (2,)
  env.reset()
  obs, rew, term, trunc, _ = env.step(
    np.zeros((4, 2), np.float32)
  )
  assert obs.shape == (4, 8)
