"""Toy-text family behavior tests.

Mirrors the reference's per-family api/behavior tests
(``envpool/toy_text/*_test.py``): board rendering, episode endings, reward
structure, discrete-space heuristics.
"""

import numpy as np
import pytest

import envpool_tpu


def test_catch_board_and_episode() -> None:
  h, w, n = 10, 5, 8
  env = envpool_tpu.make_gymnasium("Catch-v0", num_envs=n, seed=0)
  obs, _ = env.reset()
  assert obs.shape == (n, h, w)
  # ball on row 0, paddle at bottom center
  assert (obs[:, 0, :].sum(-1) == 1).all()
  assert (obs[:, h - 1, w // 2] == 1).all()
  rewards = []
  for t in range(h - 1):
    obs, rew, term, trunc, info = env.step(np.ones(n, np.int32))
    rewards.append(rew.copy())
  # episode ends after height-1 steps with reward ±1
  assert term.all()
  assert set(np.unique(rewards[-1])) <= {-1.0, 1.0}
  assert all((r == 0).all() for r in rewards[:-1])
  # auto-reset on next step
  obs, rew, term, trunc, info = env.step(np.ones(n, np.int32))
  np.testing.assert_array_equal(info["elapsed_step"], 0)
  assert (obs[:, 0, :].sum(-1) == 1).all()


def test_frozen_lake_bounds() -> None:
  env = envpool_tpu.make_gymnasium("FrozenLake-v1", num_envs=16, seed=0)
  obs, _ = env.reset()
  np.testing.assert_array_equal(obs, 0)
  for _ in range(100):
    obs, rew, term, trunc, _ = env.step(
      np.random.randint(0, 4, 16).astype(np.int32)
    )
    assert ((obs >= 0) & (obs <= 15)).all()
    assert set(np.unique(rew)) <= {0.0, 1.0}
  env8 = envpool_tpu.make_gymnasium("FrozenLake8x8-v1", num_envs=4, seed=0)
  assert env8.observation_space.n == 64


def test_cliffwalking_cliff_penalty() -> None:
  env = envpool_tpu.make_gymnasium("CliffWalking-v0", num_envs=2, seed=0)
  obs, _ = env.reset()
  np.testing.assert_array_equal(obs, 36)  # (3, 0)
  # step right from start -> onto cliff -> -100, teleport to start
  obs, rew, term, trunc, _ = env.step(np.full(2, 1, np.int32))
  np.testing.assert_array_equal(rew, -100.0)
  np.testing.assert_array_equal(obs, 36)
  assert not term.any()
  # up then right is safe, -1 each
  obs, rew, term, trunc, _ = env.step(np.zeros(2, np.int32))
  np.testing.assert_array_equal(rew, -1.0)
  np.testing.assert_array_equal(obs, 24)


def test_cliffwalking_goal() -> None:
  env = envpool_tpu.make_gymnasium("CliffWalking-v0", num_envs=1, seed=0)
  env.reset()
  env.step(np.array([0], np.int32))  # up
  for _ in range(11):
    env.step(np.array([1], np.int32))  # right x11
  obs, rew, term, trunc, _ = env.step(np.array([2], np.int32))  # down
  assert term.all()
  np.testing.assert_array_equal(obs, 47)


def test_blackjack_obs_and_end() -> None:
  n = 64
  env = envpool_tpu.make_gymnasium("Blackjack-v1", num_envs=n, seed=0)
  obs, _ = env.reset()
  assert obs.shape == (n, 3)
  assert ((obs[:, 0] >= 4) & (obs[:, 0] <= 21)).all()
  assert ((obs[:, 1] >= 1) & (obs[:, 1] <= 10)).all()
  assert set(np.unique(obs[:, 2])) <= {0, 1}
  # stick everywhere -> all episodes end with reward in {-1, 0, 1}
  obs, rew, term, trunc, _ = env.step(np.zeros(n, np.int32))
  assert term.all()
  assert set(np.unique(rew)) <= {-1.0, 0.0, 1.0}
  # rewards not all identical across 64 tables
  assert len(np.unique(rew)) > 1


def test_blackjack_hit_bust() -> None:
  n = 256
  env = envpool_tpu.make_gymnasium("Blackjack-v1", num_envs=n, seed=1)
  env.reset()
  # hit forever: every episode eventually busts with reward -1
  busted = np.zeros(n, np.bool_)
  rew_at_bust = np.zeros(n)
  for _ in range(15):
    obs, rew, term, trunc, info = env.step(np.ones(n, np.int32))
    fresh = term & ~busted & (info["elapsed_step"] > 0)
    rew_at_bust[fresh] = rew[fresh]
    busted |= fresh
  assert busted.mean() > 0.95
  np.testing.assert_array_equal(rew_at_bust[busted], -1.0)


def test_taxi_structure() -> None:
  n = 32
  env = envpool_tpu.make_gymnasium("Taxi-v3", num_envs=n, seed=0)
  obs, _ = env.reset()
  assert ((obs >= 0) & (obs <= 499)).all()
  # illegal pickup costs -10
  # (decode: s<4 means passenger waiting; force pickup everywhere)
  obs, rew, term, trunc, _ = env.step(np.full(n, 4, np.int32))
  assert set(np.unique(rew)) <= {-10.0, -1.0}
  assert (rew == -10).sum() > 0  # most positions are not the depot
  # movement costs -1
  obs, rew, term, trunc, _ = env.step(np.zeros(n, np.int32))
  np.testing.assert_array_equal(rew, -1.0)


def test_nchain_rewards() -> None:
  n = 16
  env = envpool_tpu.make_gymnasium("NChain-v0", num_envs=n, seed=0)
  obs, _ = env.reset()
  np.testing.assert_array_equal(obs, 0)
  tot = np.zeros(n)
  for _ in range(50):
    obs, rew, term, trunc, _ = env.step(np.zeros(n, np.int32))
    assert set(np.unique(rew)) <= {0.0, 2.0, 10.0}
    tot += rew
    assert ((obs >= 0) & (obs <= 4)).all()
  assert (tot > 0).all()  # forward policy reaches the end state


@pytest.mark.parametrize(
  "task,nspace", [("FrozenLake-v1", 16), ("CliffWalking-v0", 48),
                  ("Taxi-v3", 500), ("NChain-v0", 5)]
)
def test_discrete_obs_spaces(task: str, nspace: int) -> None:
  env = envpool_tpu.make_gymnasium(task, num_envs=2)
  assert env.observation_space.n == nspace
