"""ViZDoom env-class tests against a scripted fake DoomGame.

The ``vizdoom`` wheel is absent in CI; the env class's plumbing — frame
pipeline (resize + stack), game-variable delta reward shaping, episodic
life, combined-action mapping, .lmp recording paths
(``envpool/vizdoom/vizdoom_env.h:45-140, 300-360``) — is verified against
a deterministic fake emulator (technique of ``tests/test_atari_stack.py``).
"""

import sys
import types
from collections import namedtuple

import numpy as np
import pytest

from envpool_tpu.core.env import COMMON_CONFIG

RAW_H, RAW_W = 120, 160
BUTTONS = ["MOVE_FORWARD", "TURN_LEFT", "TURN_RIGHT", "ATTACK"]


class _Button:
  def __init__(self, name):
    self.name = name


class _State:
  def __init__(self, buf):
    self.screen_buffer = buf


class FakeDoomGame:
  """Scripted DoomGame: tic counter painted into the screen, HEALTH
  decays 2/step, KILLCOUNT ticks every 5 acts, episode ends at tic 60."""

  instances = []

  def __init__(self):
    self.tic = 0
    self.episode = 0
    self.seed = 0
    self.cfg_loaded = None
    self.lmp_paths = []
    self.acts = []
    FakeDoomGame.instances.append(self)

  # config surface
  def load_config(self, p):
    self.cfg_loaded = p

  def set_doom_scenario_path(self, p):
    pass

  def set_doom_game_path(self, p):
    pass

  def set_doom_map(self, m):
    pass

  def add_game_args(self, a):
    pass

  def set_window_visible(self, v):
    pass

  def set_mode(self, m):
    pass

  def set_seed(self, s):
    self.seed = s

  def init(self):
    pass

  def get_screen_channels(self):
    return 3

  def get_available_buttons(self):
    return [_Button(b) for b in BUTTONS]

  # episode surface
  def new_episode(self, path=None):
    self.tic = 0
    self.episode += 1
    if path is not None:
      self.lmp_paths.append(path)

  def get_state(self):
    buf = np.full((3, RAW_H, RAW_W), self.tic % 256, np.uint8)
    return _State(buf)

  def make_action(self, buttons, skip):
    self.acts.append((tuple(buttons), skip))
    self.tic += skip

  def is_episode_finished(self):
    return self.tic >= 60

  def is_player_dead(self):
    return 40 <= self.tic < 60

  def get_game_variable(self, gv):
    name = gv  # fake GameVariable values are their names
    if name == "HEALTH":
      return 100.0 - 2.0 * self.tic
    if name == "KILLCOUNT":
      return float(self.tic // 5)
    return 0.0


@pytest.fixture
def patched(monkeypatch):
  FakeDoomGame.instances = []
  fake = types.ModuleType("vizdoom")
  fake.DoomGame = FakeDoomGame
  fake.Mode = types.SimpleNamespace(PLAYER=0)
  # GameVariable attrs resolve to their own names (see get_game_variable)
  fake.GameVariable = types.SimpleNamespace(
    **{v: v for v in ("HEALTH", "KILLCOUNT", "FRAGCOUNT", "DEATHCOUNT",
                      "HITCOUNT", "DAMAGECOUNT", "ARMOR")}
  )
  monkeypatch.setitem(sys.modules, "vizdoom", fake)
  # the module lru_caches per cfg_path; keep fake runs out of shared keys
  yield FakeDoomGame.instances


def make_cfg(**kw):
  from envpool_tpu.envs.vizdoom.vizdoom_env import VizdoomEnv
  merged = dict(COMMON_CONFIG)
  merged.update(VizdoomEnv.default_config())
  merged.update(kw)
  Config = namedtuple("Config", [k.replace(".", "_") for k in merged])
  return Config(*merged.values())


def test_reset_frame_pipeline(patched) -> None:
  from envpool_tpu.envs.vizdoom.vizdoom_env import VizdoomEnv
  env = VizdoomEnv(make_cfg(seed=3), 2)
  game = patched[0]
  assert game.seed == 5  # seed + env_id
  obs, info = env.reset()
  # stack_num * channels planes, resized to 84x84
  assert obs.shape == (12, 84, 84) and obs.dtype == np.uint8
  # push_all on reset: all stack frames identical
  assert np.array_equal(obs[:3], obs[9:])
  assert "HEALTH" in info and info["HEALTH"] == 100.0


def test_frame_skip_and_stack_roll(patched) -> None:
  from envpool_tpu.envs.vizdoom.vizdoom_env import VizdoomEnv
  env = VizdoomEnv(make_cfg(frame_skip=4), 0)
  env.reset()
  game = patched[0]
  obs1, *_ = env.step(np.asarray([1.0, 0.0, 0.0, 0.0]))
  assert game.acts[-1] == ((1.0, 0.0, 0.0, 0.0), 4)
  assert obs1[-1].max() == 4  # newest frame painted with tic=4
  obs2, *_ = env.step(np.asarray([0.0, 0.0, 0.0, 0.0]))
  # stack rolled by one frame (one channel group)
  assert np.array_equal(obs2[6:9], obs1[9:12])


def test_reward_shaping_deltas(patched) -> None:
  """reward = pos*max(d,0) + neg*max(-d,0) per variable per step
  (vizdoom_env.h:52-66): HEALTH -8/step -> -8*0.003... and KILLCOUNT."""
  from envpool_tpu.envs.vizdoom.vizdoom_env import VizdoomEnv
  env = VizdoomEnv(make_cfg(frame_skip=5), 0)
  env.reset()
  obs, rew, done, info = env.step(np.zeros(4))
  # tic 0 -> 5: HEALTH 100->90 (delta -10, neg coef -0.003 -> 0.03 loss)
  # KILLCOUNT 0->1 (pos coef 1)
  assert rew == pytest.approx(1.0 - 0.03)


def test_episodic_life_and_episode_end(patched) -> None:
  from envpool_tpu.envs.vizdoom.vizdoom_env import VizdoomEnv
  env = VizdoomEnv(make_cfg(frame_skip=10, episodic_life=True), 0)
  env.reset()
  dones = []
  for _ in range(6):
    _, _, done, _ = env.step(np.zeros(4))
    dones.append(bool(done))
  # dead from tic 40 (episodic life) and true end at 60
  assert dones == [False, False, False, True, True, True]


def test_lmp_recording_paths(tmp_path, patched) -> None:
  from envpool_tpu.envs.vizdoom.vizdoom_env import VizdoomEnv
  env = VizdoomEnv(make_cfg(lmp_save_dir=str(tmp_path)), 4)
  env.reset()
  env.reset()
  game = patched[0]
  assert len(game.lmp_paths) == 2
  assert game.lmp_paths[0].endswith("env_4_ep_1.lmp")
  assert game.lmp_paths[1].endswith("env_4_ep_2.lmp")


def test_combined_action_mapping(patched) -> None:
  """use_combined_action: discrete id -> button row via build_action_set."""
  from envpool_tpu.envs.vizdoom.action_set import build_action_set
  from envpool_tpu.envs.vizdoom.vizdoom_env import VizdoomEnv
  env = VizdoomEnv(make_cfg(use_combined_action=True), 0)
  env.reset()
  expected = build_action_set(BUTTONS, False, {})
  env.step(np.int32(1))
  game = patched[0]
  assert list(game.acts[-1][0]) == list(expected[1])


def test_through_host_pool(patched) -> None:
  from envpool_tpu.core.envpool_api import py_env
  from envpool_tpu.core.host_pool import HostEnvPool
  from envpool_tpu.envs.vizdoom.vizdoom_env import VizdoomEnv

  spec_cls, _, _, gymnasium_cls = py_env(VizdoomEnv, pool_base=HostEnvPool)
  spec = spec_cls(spec_cls.gen_config(
    num_envs=2, seed=0, max_episode_steps=100, cfg_path="__fake__"
  ))
  env = gymnasium_cls(spec)
  obs, info = env.reset()
  assert obs.shape == (2, 12, 84, 84)
  obs, rew, term, trunc, info = env.step(
    np.zeros((2, 4), np.float64)
  )
  assert obs.shape == (2, 12, 84, 84)
  assert info["HEALTH"].shape == (2,)
