"""Pool checkpoint/resume tests.

The reference cannot snapshot env state (SURVEY §5.4); here it must
round-trip exactly: save mid-episode, keep stepping, restore, and replay
bit-identically.
"""

import numpy as np

import envpool_tpu
from envpool_tpu.utils import load_pool_state, save_pool_state


def test_save_restore_bit_exact(tmp_path) -> None:
  env = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=8, seed=4)
  env.reset()
  acts = np.zeros(8, np.int32)
  for _ in range(5):
    env.step(acts)
  snap = env.save_state()
  ref = [np.asarray(env.step(acts)[0]) for _ in range(5)]
  env.load_state(snap)
  replay = [np.asarray(env.step(acts)[0]) for _ in range(5)]
  for a, b in zip(ref, replay):
    np.testing.assert_array_equal(a, b)


def test_save_restore_via_files(tmp_path) -> None:
  env = envpool_tpu.make_gymnasium("Catch-v0", num_envs=4, seed=0)
  env.reset()
  env.step(np.zeros(4, np.int32))
  path = str(tmp_path / "pool_ckpt")
  save_pool_state(env, path)
  obs_a, *_ = env.step(np.ones(4, np.int32))
  load_pool_state(env, path)
  obs_b, *_ = env.step(np.ones(4, np.int32))
  np.testing.assert_array_equal(obs_a, obs_b)
