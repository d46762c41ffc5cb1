"""CarRacing behavioral tests (cf. ``envpool/box2d`` car racing tests)."""

import numpy as np

import envpool_tpu
from envpool_tpu.envs.box2d.car_track import PALETTE, generate_track


def test_track_generation() -> None:
  rng = np.random.default_rng(3)
  t = generate_track(rng)
  assert 200 < t.n_tiles < 460
  # road pixels exist and tile quads are near the baked road
  road = np.isin(t.bitmap, [2, 3, 4])
  assert road.mean() > 0.01


def _make(num_envs=2, **kw):
  return envpool_tpu.make_gymnasium(
    "CarRacing-v2", num_envs=num_envs, seed=0, n_tracks=2, **kw
  )


def test_reset_obs() -> None:
  env = _make()
  obs, info = env.reset()
  assert obs.shape == (2, 96, 96, 3) and obs.dtype == np.uint8
  # the view contains road pixels (car starts on the track) and the
  # indicator bar (bottom rows black)
  flat = obs[0].reshape(-1, 3)
  assert (flat == PALETTE[2]).all(-1).any() or (
    flat == PALETTE[3]
  ).all(-1).any()
  assert np.all(obs[:, 95, :48] == 0)


def test_gas_collects_tiles_and_reward() -> None:
  env = _make()
  env.reset()
  total = np.zeros(2)
  for _ in range(80):
    obs, rew, term, trunc, info = env.step(
      np.tile(np.asarray([[0, 1, 0]], np.float32), (2, 1))
    )
    total += rew
  assert np.all(info["tile_visited_count"] >= 3)
  assert np.all(total > 0)  # tile rewards dominate the -0.1 frame cost


def test_brake_stops_progress() -> None:
  env = _make()
  env.reset()
  for _ in range(40):
    _, _, _, _, info_gas = env.step(
      np.tile(np.asarray([[0, 1, 0]], np.float32), (2, 1))
    )
  env2 = _make()
  env2.reset()
  for _ in range(40):
    _, _, _, _, info_brake = env2.step(
      np.tile(np.asarray([[0, 0, 1]], np.float32), (2, 1))
    )
  assert np.all(
    info_gas["tile_visited_count"] > info_brake["tile_visited_count"]
  )


def test_determinism() -> None:
  def run(seed):
    env = envpool_tpu.make_gymnasium(
      "CarRacing-v2", num_envs=2, seed=seed, n_tracks=2
    )
    obs, _ = env.reset()
    acc = [obs]
    for _ in range(10):
      obs, *_ = env.step(
        np.tile(np.asarray([[0.2, 0.5, 0]], np.float32), (2, 1))
      )
      acc.append(obs)
    return np.stack(acc)

  np.testing.assert_array_equal(run(7), run(7))
