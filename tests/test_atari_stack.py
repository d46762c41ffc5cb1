"""Atari wrapper-stack tests against a scripted fake ALE.

ale_py is an optional dependency (absent in CI, like most reference
families are optional, ``envpool/entry.py:17-55``); the wrapper stack —
noop/fire reset, frame-skip maxpool, stacking, episodic life, reward clip
(``envpool/atari/atari_env.h:151-247``) — is pure logic and is verified
here against a deterministic fake emulator.
"""

from collections import namedtuple

import numpy as np
import pytest

from envpool_tpu.core.env import COMMON_CONFIG
from envpool_tpu.envs.atari import atari_env as A

RAW_H, RAW_W = A.RAW_H, A.RAW_W


class FakeALE:
  """Scripted emulator: frame counter drawn into the screen; 3 lives;
  game over after `end_at` acts; reward = the action value."""

  def __init__(self, end_at=1000):
    self.t = 0
    self.end_at = end_at
    self._lives = 3
    self.acts = []

  def getMinimalActionSet(self):
    return [0, 1, 3, 4]

  def getLegalActionSet(self):
    return list(range(18))

  def act(self, a):
    self.t += 1
    self.acts.append(int(a))
    if self.t % 37 == 36:
      self._lives -= 1
    return float(a)

  def game_over(self):
    return self.t >= self.end_at or self._lives <= 0

  def lives(self):
    return self._lives

  def reset_game(self):
    self.t = 0
    self._lives = 3

  def getScreenGrayscale(self, buf):
    buf[:] = self.t % 256

  def getScreenRGB(self, buf):
    buf[:] = self.t % 256


def make_cfg(**kw):
  merged = dict(COMMON_CONFIG)
  merged.update(A.AtariEnv.default_config())
  merged.update(kw)
  Config = namedtuple("Config", [k.replace(".", "_") for k in merged])
  return Config(*merged.values())


@pytest.fixture
def patched(monkeypatch):
  ales = []

  def fake_make(task, seed, rap):
    ale = FakeALE()
    ales.append(ale)
    return ale

  monkeypatch.setattr(A, "_make_ale", fake_make)
  return ales


def test_noop_and_fire_reset(patched):
  env = A.AtariEnv(make_cfg(noop_max=30, seed=0), 0)
  obs, info = env.reset()
  ale = patched[0]
  # noop+fire: all noops (0) then exactly one FIRE (1) at the end
  assert ale.acts[-1] == 1
  assert all(a == 0 for a in ale.acts[:-1])
  assert 1 <= len(ale.acts) <= 30
  assert obs.shape == (4, 84, 84)
  # push_all on reset: all stack frames identical
  assert np.array_equal(obs[0], obs[1]) and np.array_equal(obs[1], obs[3])


def test_frame_skip_and_maxpool(patched):
  env = A.AtariEnv(make_cfg(noop_max=1, use_fire_reset=False, seed=0), 0)
  env.reset()
  ale = patched[0]
  t0 = ale.t
  obs, rew, term, info = env.step(2)  # action index 2 -> act value 3
  assert ale.t == t0 + 4              # frame_skip acts
  assert rew == 4 * 3.0               # reward accumulates over the skip
  # maxpool of the LAST TWO frames: screen value is t%256, so the stacked
  # newest frame equals max(t0+3, t0+4) scaled through the resize (values
  # are constant across the screen so resize preserves them)
  assert obs[-1].max() == (t0 + 4) % 256


def test_stack_rolls(patched):
  env = A.AtariEnv(make_cfg(noop_max=1, use_fire_reset=False, seed=0), 0)
  env.reset()
  frames = []
  for i in range(5):
    obs, *_ = env.step(0)
    frames.append(obs.copy())
  # each step shifts the stack by one frame
  assert np.array_equal(frames[1][0:3], frames[0][1:4])


def test_episodic_life_and_reward_clip(patched):
  env = A.AtariEnv(
    make_cfg(noop_max=1, use_fire_reset=False, episodic_life=True,
             reward_clip=True, seed=0), 0
  )
  env.reset()
  done_at = None
  for i in range(40):
    obs, rew, term, info = env.step(3)  # act value 4 -> clipped to 1
    assert rew == 1.0
    assert info["reward"] == 4 * 4.0    # unclipped in info
    if term:
      done_at = i
      break
  assert done_at is not None            # life lost around act 36
  assert info["terminated"] == 0        # life loss is not game over
  # episodic-life reset must NOT reset the real game
  ale_t_before = env.ale.t
  env.reset()
  assert env.ale.t > 0 and env.ale.t >= ale_t_before


def test_full_action_space(patched):
  env = A.AtariEnv(make_cfg(full_action_space=True, seed=0), 0)
  assert len(env.action_set) == 18
