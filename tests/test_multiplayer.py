"""Static-shape multiplayer engine tests (SURVEY P6).

Mirrors the reference dummy's multi-player round trip
(``envpool/dummy/dummy_py_envpool_test.py``): per-player action rows keyed
by players.env_id go in, per-player reward/info rows come out, with padded
slots compacted away at the host boundary.
"""

import numpy as np
import pytest

import envpool_tpu


def _make(num_envs=4, max_players=3):
  return envpool_tpu.make_gymnasium(
    "Dummy-v0", num_envs=num_envs, max_num_players=max_players, state_num=5
  )


def test_player_counts_and_compaction() -> None:
  env = _make()
  # env e has (e % 3) + 1 live players: 1, 2, 3, 1 -> 7 rows total
  state = env._reset(np.arange(4, dtype=np.int32)) or env._recv()
  keys = env.spec._state_keys
  out = dict(zip(keys, state))
  np.testing.assert_array_equal(
    out["info:players.env_id"], [0, 1, 1, 2, 2, 2, 3]
  )
  assert out["reward"].shape == (7,)
  np.testing.assert_array_equal(out["reward"], 0.0)
  # per-env fields stay [num_envs]
  assert out["done"].shape == (4,)
  np.testing.assert_array_equal(out["info:players.id"].ravel()[:3], [0, 0, 1])


def test_per_player_actions_and_rewards() -> None:
  env = _make()
  env._reset(np.arange(4, dtype=np.int32))
  env._recv()
  players_env_id = np.asarray([0, 1, 1, 2, 2, 2, 3], np.int32)
  action_rows = np.asarray([5, 1, 2, 3, 4, 5, 2], np.int32)
  alist = [
    np.arange(4, dtype=np.int32),         # env_id
    players_env_id,                       # players.env_id
    action_rows,                          # per-player action
  ]
  env._send(alist)
  out = dict(zip(env.spec._state_keys, env._recv()))
  # rewards echo each player's action, in the same row order
  np.testing.assert_array_equal(out["reward"], action_rows.astype(np.float32))
  np.testing.assert_array_equal(
    out["info:players.env_id"], players_env_id
  )
  np.testing.assert_array_equal(out["discount"], 1.0)


def test_multiplayer_guards() -> None:
  env = _make()
  with pytest.raises(RuntimeError):
    env.xla()  # same gate as the reference (py_envpool.h:220-238)
  with pytest.raises(ValueError):
    envpool_tpu.make_gymnasium(
      "CartPole-v1", num_envs=2, max_num_players=2
    )


def test_async_multiplayer_cohorts() -> None:
  """batch_size < num_envs: per-cohort player rows round-trip.

  The reference supports this through dynamic player offsets in the
  state buffer (``envpool/core/state_buffer.h:87-93``); here cohorts go
  through the masked advance with padded players + host compaction.
  """
  env = envpool_tpu.make_gymnasium(
    "Dummy-v0", num_envs=4, batch_size=2, max_num_players=3, state_num=50
  )
  env.async_reset()
  seen = set()
  for _ in range(2):
    out = dict(zip(env.spec._state_keys, env._recv()))
    cohort = np.asarray(out["info:env_id"])
    assert cohort.shape == (2,)
    seen.update(int(e) for e in cohort)
    # live players per env e is (e % 3) + 1 (dummy's contract)
    expect_players = np.concatenate(
      [np.full(int(e) % 3 + 1, e, np.int32) for e in cohort]
    )
    np.testing.assert_array_equal(out["info:players.env_id"], expect_players)
  assert seen == {0, 1, 2, 3}

  # step cohort {1, 3}: rewards echo each player's action rows
  players_env_id = np.asarray([1, 1, 3], np.int32)  # env1: 2p, env3: 1p
  action_rows = np.asarray([7, 8, 9], np.int32)
  env._send([
    np.asarray([1, 3], np.int32), players_env_id, action_rows,
  ])
  out = dict(zip(env.spec._state_keys, env._recv()))
  np.testing.assert_array_equal(out["info:env_id"], [1, 3])
  np.testing.assert_array_equal(out["info:players.env_id"], players_env_id)
  np.testing.assert_array_equal(out["reward"], action_rows.astype(np.float32))
  np.testing.assert_array_equal(out["elapsed_step"], [1, 1])


def test_async_multiplayer_interleaved_progress() -> None:
  """Cohorts advance independently; per-env FIFO order is preserved."""
  env = envpool_tpu.make_gymnasium(
    "Dummy-v0", num_envs=4, batch_size=2, max_num_players=2, state_num=50
  )
  env.async_reset()
  elapsed = {e: 0 for e in range(4)}
  for _ in range(8):
    out = dict(zip(env.spec._state_keys, env._recv()))
    cohort = np.asarray(out["info:env_id"])
    for pos, e in enumerate(cohort):
      assert int(out["elapsed_step"][pos]) == elapsed[int(e)]
      elapsed[int(e)] += 1
    rows = np.concatenate(
      [np.full(int(e) % 2 + 1, int(e) + 1, np.int32) for e in cohort]
    )
    env._send([
      cohort.astype(np.int32),
      np.asarray(out["info:players.env_id"], np.int32),
      rows,
    ])
  assert sum(elapsed.values()) == 16
