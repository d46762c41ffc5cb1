"""Procgen env-class tests against a scripted fake gym3 backend.

The ``procgen`` wheel is absent in CI (optional, like most reference
families, ``envpool/entry.py:17-55``), but the env class's reset/step/info
plumbing — gym3 auto-reset "first" flag, channel_first transpose, level
seed info fields, per-env seeding (``envpool/procgen/procgen_env.h:58-88,
125-210``) — is pure logic, verified here against a deterministic fake
ProcgenGym3Env (same technique as ``tests/test_atari_stack.py``).
"""

import sys
import types
from collections import namedtuple

import numpy as np
import pytest

from envpool_tpu.core.env import COMMON_CONFIG

RES = 64


class FakeProcgenGame:
  """Scripted gym3 env: frame counter painted into the screen; episode
  ends every `ep_len` acts; reward = last action; level seeds advance."""

  instances = []

  def __init__(self, num=1, env_name="bigfish", rand_seed=0, **kwargs):
    assert num == 1
    self.env_name = env_name
    self.rand_seed = rand_seed
    self.kwargs = kwargs
    self.t = 0
    self.ep_len = 9
    self.level_seed = rand_seed
    self.prev_level_seed = -1
    self.prev_complete = 0
    self.last_rew = 0.0
    self.first = True
    FakeProcgenGame.instances.append(self)

  def observe(self):
    frame = np.full((RES, RES, 3), self.t % 256, np.uint8)
    frame[0, 0, 0] = self.level_seed % 256
    return (
      np.asarray([self.last_rew], np.float32),
      {"rgb": frame[None]},
      np.asarray([self.first], bool),
    )

  def act(self, action):
    self.t += 1
    self.last_rew = float(np.asarray(action).ravel()[0])
    if self.t % self.ep_len == 0:
      self.first = True
      self.prev_level_seed = self.level_seed
      self.prev_complete = 1
      self.level_seed += 100
    else:
      self.first = False

  def get_info(self):
    return [{
      "prev_level_seed": self.prev_level_seed,
      "prev_level_complete": self.prev_complete,
      "level_seed": self.level_seed,
    }]


@pytest.fixture
def patched(monkeypatch):
  FakeProcgenGame.instances = []
  fake = types.ModuleType("procgen")
  fake.ProcgenGym3Env = FakeProcgenGame
  monkeypatch.setitem(sys.modules, "procgen", fake)
  yield FakeProcgenGame.instances


def make_cfg(**kw):
  from envpool_tpu.envs.procgen.procgen_env import ProcgenEnv
  merged = dict(COMMON_CONFIG)
  merged.update(ProcgenEnv.default_config())
  merged.update(kw)
  Config = namedtuple("Config", [k.replace(".", "_") for k in merged])
  return Config(*merged.values())


def test_reset_step_and_info_plumbing(patched) -> None:
  from envpool_tpu.envs.procgen.procgen_env import ProcgenEnv
  env = ProcgenEnv(make_cfg(seed=7), 3)
  game = patched[0]
  assert game.rand_seed == 10  # seed + env_id (procgen_env.h:71-89)
  obs, info = env.reset()
  assert obs.shape == (3, RES, RES) and obs.dtype == np.uint8
  assert info["level_seed"] == 10
  assert info["prev_level_seed"] == -1
  obs, rew, first, info = env.step(np.int32(5))
  assert rew == 5.0
  assert not first
  # channel_first transpose: painted counter appears on every channel
  assert obs[1, 5, 5] == 1


def test_channel_last(patched) -> None:
  from envpool_tpu.envs.procgen.procgen_env import ProcgenEnv
  env = ProcgenEnv(make_cfg(channel_first=False), 0)
  obs, _ = env.reset()
  assert obs.shape == (RES, RES, 3)


def test_gym3_autoreset_first_flag_is_done(patched) -> None:
  """gym3's 'first' on the post-step observe marks episode end; level
  seeds roll to the next level (procgen_env.h:150-210)."""
  from envpool_tpu.envs.procgen.procgen_env import ProcgenEnv
  env = ProcgenEnv(make_cfg(), 0)
  env.reset()
  firsts = []
  for t in range(10):
    obs, rew, first, info = env.step(np.int32(1))
    firsts.append(bool(first))
  assert firsts.count(True) == 1 and firsts[8]
  assert env._info()["prev_level_complete"] == 1
  assert env._info()["level_seed"] != env._info()["prev_level_seed"]


def test_through_host_pool(patched) -> None:
  """Full HostEnvPool round trip: batched obs/reward/done, auto-reset."""
  from envpool_tpu.core.envpool_api import py_env
  from envpool_tpu.core.host_pool import HostEnvPool
  from envpool_tpu.envs.procgen.procgen_env import ProcgenEnv

  spec_cls, _, _, gymnasium_cls = py_env(ProcgenEnv, pool_base=HostEnvPool)
  spec = spec_cls(spec_cls.gen_config(
    num_envs=3, seed=0, max_episode_steps=100
  ))
  env = gymnasium_cls(spec)
  obs, info = env.reset()
  assert obs.shape == (3, 3, RES, RES)
  np.testing.assert_array_equal(sorted(info["env_id"]), [0, 1, 2])
  for t in range(12):
    acts = np.full(3, 2, np.int32)
    obs, rew, term, trunc, info = env.step(acts)
    if t < 8:
      np.testing.assert_array_equal(rew, 2.0)
  # each env saw exactly one episode end within 12 steps (ep_len 9)
  assert all(g.prev_complete == 1 for g in patched[:3])
