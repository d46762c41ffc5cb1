"""LunarLander alignment vs gymnasium's real Box2D implementation.

The JAX dynamics are a re-derivation, so the tests here check measured
physical agreement (SURVEY §7.7 behavioral/distributional parity):
ballistic kinematics and engine authority must match the Box2D env to a
few percent, and random-policy outcome statistics must be in the same
regime.
"""

import gymnasium
import numpy as np

import envpool_tpu


def _vy_slope(obs_list):
  vy = np.asarray([o[3] for o in obs_list])
  return np.mean(np.diff(vy))


def _ref_rollout(action, steps, seed=0):
  env = gymnasium.make("LunarLander-v3").unwrapped
  obs, _ = env.reset(seed=seed)
  out = [obs]
  for _ in range(steps):
    obs, *_ , = env.step(action)
    out.append(obs)
  return out


def _our_rollout(action, steps, seed=0, num_envs=8):
  env = envpool_tpu.make_gymnasium(
    "LunarLander-v2", num_envs=num_envs, seed=seed
  )
  obs, _ = env.reset()
  out = [obs]
  acts = np.full(num_envs, action, np.int32)
  for _ in range(steps):
    obs, rew, term, trunc, _ = env.step(acts)
    out.append(obs)
  return out


def test_freefall_gravity_slope_matches_box2d() -> None:
  ref = [_ref_rollout(0, 10, seed=s) for s in range(4)]
  ours = _our_rollout(0, 10)
  slope_ref = np.mean([_vy_slope(r) for r in ref])
  ours_arr = np.stack(ours)            # [T, n, 8]
  slope_ours = np.mean(np.diff(ours_arr[:, :, 3], axis=0))
  # same gravity, same dt, same obs scaling -> slopes agree closely
  assert abs(slope_ours - slope_ref) < 0.15 * abs(slope_ref), (
    slope_ours, slope_ref
  )


def test_main_engine_authority_matches_box2d() -> None:
  ref_off = np.mean([_vy_slope(_ref_rollout(0, 10, seed=s))
                     for s in range(4)])
  ref_on = np.mean([_vy_slope(_ref_rollout(2, 10, seed=s))
                    for s in range(4)])
  ours_off = np.mean(np.diff(
    np.stack(_our_rollout(0, 10))[:, :, 3], axis=0
  ))
  ours_on = np.mean(np.diff(
    np.stack(_our_rollout(2, 10))[:, :, 3], axis=0
  ))
  lift_ref = ref_on - ref_off
  lift_ours = ours_on - ours_off
  # engine thrust effect within 25% (dispersion noise + different RNG)
  assert lift_ref > 0 and lift_ours > 0
  assert abs(lift_ours - lift_ref) < 0.25 * lift_ref, (
    lift_ours, lift_ref
  )


def test_random_policy_outcomes_same_regime() -> None:
  # reference: fraction of no-control episodes ending in crash (-100)
  ref_crashes = 0
  n_ref = 10
  for s in range(n_ref):
    env = gymnasium.make("LunarLander-v3").unwrapped
    env.reset(seed=100 + s)
    for _ in range(300):
      _, r, term, trunc, _ = env.step(0)
      if term or trunc:
        ref_crashes += float(r) < -50
        break
  env = envpool_tpu.make_gymnasium("LunarLander-v2", num_envs=32, seed=9)
  env.reset()
  done = np.zeros(32, bool)
  crashed = np.zeros(32, bool)
  for _ in range(300):
    _, r, term, trunc, _ = env.step(np.zeros(32, np.int32))
    newly = (term | trunc) & ~done
    crashed |= newly & (r < -50)
    done |= term | trunc
  ref_rate = ref_crashes / n_ref
  our_rate = crashed.sum() / max(done.sum(), 1)
  assert abs(our_rate - ref_rate) < 0.4, (our_rate, ref_rate)
