"""BipedalWalker alignment vs gymnasium's real Box2D implementation.

The JAX walker is a generalized-coordinates re-derivation (not a Box2D
port), so these are measured-alignment tests, same methodology as
``test_align_lunar_lander.py`` (SURVEY §7.7 behavioral parity): terrain
statistics, lidar geometry, motor speed-control response, standing
stability and random-policy outcome regimes must quantitatively match
the reference env (``envpool/box2d/bipedal_walker_env.cc`` wraps the
same gym Box2D dynamics that gymnasium ships).
"""

import gymnasium
import numpy as np

import envpool_tpu

FPS = 50.0
SPEED_HIP = 4.0


def _ref_env(seed=0, hardcore=False):
  name = "BipedalWalkerHardcore-v3" if hardcore else "BipedalWalker-v3"
  env = gymnasium.make(name).unwrapped
  obs, _ = env.reset(seed=seed)
  return env, obs


def _our_env(num_envs=8, seed=0, task="BipedalWalker-v3"):
  env = envpool_tpu.make_gymnasium(task, num_envs=num_envs, seed=seed)
  obs, _ = env.reset()
  return env, obs


def test_terrain_statistics_match_box2d() -> None:
  """Grass random-walk heightfield: same mean / roughness as Box2D's.

  The reference terrain generator (`bipedal_walker_env.cc:109-200`) is the
  gym state machine; ours reproduces the recurrence exactly, so mean and
  std of terrain_y must agree across seeds.
  """
  import jax

  from envpool_tpu.envs.box2d.bipedal_walker import _terrain_heights

  ref_means, ref_stds = [], []
  for s in range(6):
    env, _ = _ref_env(seed=s)
    ty = np.asarray(env.terrain_y if hasattr(env, "terrain_y") else
                    [p[1] for p in env.terrain_poly])
    ref_means.append(ty.mean())
    ref_stds.append(ty.std())
  ours = np.asarray(jax.vmap(lambda k: _terrain_heights(k, False))(
    jax.random.split(jax.random.PRNGKey(0), 16)
  ))
  assert abs(ours.mean() - np.mean(ref_means)) < 0.1, (
    ours.mean(), np.mean(ref_means)
  )
  assert abs(ours.std(1).mean() - np.mean(ref_stds)) < 0.06, (
    ours.std(1).mean(), np.mean(ref_stds)
  )


def test_reset_lidar_geometry_matches_box2d() -> None:
  """The 10 lidar fractions at reset trace the same ray geometry.

  Standing on near-flat startpad terrain, each ray's hit fraction is a
  deterministic function of hull height and the ray table
  (`bipedal_walker_env.cc:317-321`); per-ray agreement within 0.1.
  """
  ref = np.mean(
    [_ref_env(seed=s)[1][14:24] for s in range(4)], axis=0
  )
  _, obs = _our_env(num_envs=16)
  ours = obs[:, 14:24].mean(0)
  assert np.all(np.abs(ours - ref) < 0.1), (ours, ref)
  # both saturate (no hit) on the most-backward rays
  assert ref[-1] == 1.0 and ours[-1] == 1.0
  # monotone increasing profile in both (rays sweep from down to back)
  assert np.all(np.diff(ref) > -1e-6) and np.all(np.diff(ours) > -1e-6)


def test_standing_stability_matches_box2d() -> None:
  """Zero action for 20 steps: neither walker falls; hull stays level."""
  env, obs = _ref_env(seed=0)
  term = False
  for _ in range(20):
    obs, r, term, trunc, _ = env.step(np.zeros(4, np.float32))
    assert not term
  ref_hull_angle = abs(obs[0])

  env, obs = _our_env(num_envs=8)
  for _ in range(20):
    obs, r, term, trunc, _ = env.step(np.zeros((8, 4), np.float32))
    assert not np.any(term)
  assert np.all(np.abs(obs[:, 0]) < 0.2)
  assert ref_hull_angle < 0.2


def test_hip_motor_speed_control_matches_box2d() -> None:
  """Full hip1 action: joint tracks SPEED_HIP under speed control.

  The reference clamps motor speed to ``SPEED_HIP * sign(a)`` with torque
  budget ``MOTORS_TORQUE * |a|`` (`bipedal_walker_env.cc:287-300`), so the
  hip angle advances ~SPEED_HIP/FPS = 0.08 rad/step once saturated; our
  speed-controlled torque law must land in the same band.
  """
  env, _ = _ref_env(seed=1)
  a = np.array([1, 0, 0, 0], np.float32)
  ref_ang, ref_vel = [], []
  for _ in range(12):
    obs, *_ = env.step(a)
    ref_ang.append(obs[4])
    ref_vel.append(obs[5])
  ref_slope = np.mean(np.diff(ref_ang[3:]))

  env, _ = _our_env(num_envs=8, seed=1)
  aa = np.tile(a, (8, 1))
  our_ang, our_vel = [], []
  for _ in range(12):
    obs, *_ = env.step(aa)
    our_ang.append(obs[:, 4].mean())
    our_vel.append(obs[:, 5].mean())
  our_slope = np.mean(np.diff(our_ang[3:]))

  # saturated advance rate within 35% of Box2D's (0.08 rad/step nominal)
  assert ref_slope > 0 and our_slope > 0
  assert abs(our_slope - ref_slope) < 0.35 * ref_slope, (
    our_slope, ref_slope
  )
  # normalized joint speed near saturation (=1.0) in both
  assert np.mean(ref_vel[3:]) > 0.6
  assert np.mean(our_vel[3:]) > 0.6


def test_torque_cost_scale_matches_box2d() -> None:
  """Per-step reward for pure torque (no progress) has the same scale.

  Reward = shaping delta - 0.00035 * 80 * sum|a| (:332-339). Standing
  still with zero action must cost ~0 in both; the first steps' rewards
  are small and not -100.
  """
  env, _ = _ref_env(seed=0)
  ref_r = [env.step(np.zeros(4, np.float32))[1] for _ in range(10)]
  env, _ = _our_env(num_envs=4)
  our_r = np.stack(
    [env.step(np.zeros((4, 4), np.float32))[1] for _ in range(10)]
  )
  assert np.all(np.abs(ref_r) < 1.0)
  assert np.all(np.abs(our_r) < 1.0)


def test_random_policy_outcome_regime_matches_box2d() -> None:
  """Random actions make the walker fall (-100) well before 300 steps."""
  rng = np.random.default_rng(0)
  falls = 0
  n_ref = 6
  for s in range(n_ref):
    env, _ = _ref_env(seed=20 + s)
    for t in range(300):
      a = rng.uniform(-1, 1, 4).astype(np.float32)
      _, r, term, trunc, _ = env.step(a)
      if term:
        falls += r < -50
        break
  ref_rate = falls / n_ref

  env, _ = _our_env(num_envs=32, seed=7)
  done = np.zeros(32, bool)
  fell = np.zeros(32, bool)
  for t in range(300):
    a = rng.uniform(-1, 1, (32, 4)).astype(np.float32)
    _, r, term, trunc, _ = env.step(a)
    newly = term & ~done
    fell |= newly & (r < -50)
    done |= term | trunc
  our_rate = fell.sum() / 32
  # both in the "mostly falls" regime
  assert ref_rate > 0.5 and our_rate > 0.5, (ref_rate, our_rate)


def test_hardcore_terrain_rougher_in_both() -> None:
  """Hardcore obstacles raise terrain variance vs normal in both."""
  import jax

  from envpool_tpu.envs.box2d.bipedal_walker import _terrain_heights

  env, _ = _ref_env(seed=0, hardcore=True)
  ty_hc = np.asarray(env.terrain_y if hasattr(env, "terrain_y") else
                     [p[1] for p in env.terrain_poly])
  env, _ = _ref_env(seed=0, hardcore=False)
  ty_n = np.asarray(env.terrain_y if hasattr(env, "terrain_y") else
                    [p[1] for p in env.terrain_poly])
  keys = jax.random.split(jax.random.PRNGKey(3), 8)
  ours_hc = np.asarray(jax.vmap(lambda k: _terrain_heights(k, True))(keys))
  ours_n = np.asarray(jax.vmap(lambda k: _terrain_heights(k, False))(keys))
  assert ty_hc.std() > ty_n.std()
  assert ours_hc.std(1).mean() > ours_n.std(1).mean()
