"""Host-pool concurrency stress tests.

Counterpart of the reference's lock-free queue gtest stress suite
(``envpool/core/action_buffer_queue_test.cc``,
``state_buffer_queue_test.cc`` — producer/consumer hammering): the
HostEnvPool's thread-pool dispatch, completion queue, and per-env FIFO
ordering are hammered through many interleaved async send/recv cycles.
"""

import numpy as np

import envpool_tpu


def test_async_hammer_first_finishers() -> None:
  num_envs, batch = 16, 4
  env = envpool_tpu.make_gymnasium(
    "InvertedPendulum-v4", num_envs=num_envs, batch_size=batch,
    num_threads=8, seed=0,
  )
  env.async_reset()
  seen = np.zeros(num_envs, np.int64)
  for it in range(200):
    obs, rew, term, trunc, info = env.recv()
    ids = info["env_id"]
    assert len(ids) == batch
    assert len(np.unique(ids)) == batch  # an env is never in flight twice
    seen[ids] += 1
    env.send(np.zeros((batch, 1)), env_id=ids)
  # every env keeps making progress (no starvation/deadlock)
  assert seen.min() > 0
  assert seen.sum() == 200 * batch


def test_sync_order_is_stable_under_threads() -> None:
  env = envpool_tpu.make_gymnasium(
    "InvertedPendulum-v4", num_envs=32, num_threads=8, seed=1
  )
  env.reset()
  for _ in range(30):
    obs, rew, term, trunc, info = env.step(np.zeros((32, 1)))
    # sync recv is ordered by send position (state_buffer.h:94-97)
    np.testing.assert_array_equal(info["env_id"], np.arange(32))


def test_partial_sync_subset() -> None:
  env = envpool_tpu.make_gymnasium(
    "InvertedPendulum-v4", num_envs=8, seed=2
  )
  env.reset()
  subset = np.asarray([6, 1, 3], np.int32)
  obs, rew, term, trunc, info = env.step(
    np.zeros((3, 1)), env_id=subset
  )
  np.testing.assert_array_equal(info["env_id"], subset)


def test_worker_exception_surfaces() -> None:
  env = envpool_tpu.make_gymnasium(
    "InvertedPendulum-v4", num_envs=2, seed=3
  )
  env.reset()
  env._envs[0].frame_skip = -1  # poison one env
  env._envs[0].mujoco_step = None
  try:
    env.step(np.zeros((2, 1)))
    raised = False
  except TypeError:
    raised = True
  assert raised
