"""Container (nested-dynamic) spec tests.

Mirrors the reference dummy's container obs round trip
(``envpool/dummy/dummy_envpool.h:146-158``, ``Spec<Container<int>>``,
``envpool/core/spec.h:100-110``): per-env dynamically-shaped arrays flow
through the batched engine — here as padded (data, shape) pairs on device,
delivered as ragged object-array columns at the host boundary.
"""

import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.core.spec import ArraySpec, ContainerSpec


def test_container_spec_surface() -> None:
  spec = envpool_tpu.make_spec("Dummy-v0", num_envs=4, container_obs=True)
  cs = spec.state_array_spec["obs:dyn"]
  assert isinstance(cs, ContainerSpec)
  assert cs.inner.shape == (-1, 10)  # dynamic rows, like the reference
  assert cs.max_shape == (4, 10)
  assert cs.dtype == np.int32
  # rank mismatch is rejected
  with pytest.raises(ValueError):
    ContainerSpec(ArraySpec(np.int32, (-1,)), max_shape=(3, 4))


def test_container_ragged_round_trip() -> None:
  """Each env's obs:dyn arrives sliced to its actual dims."""
  env = envpool_tpu.make_gymnasium("Dummy-v0", num_envs=6, container_obs=True)
  env._reset(np.arange(6, dtype=np.int32))
  out = dict(zip(env.spec._state_keys, env._recv()))
  dyn = out["obs:dyn"]
  assert dyn.dtype == object
  for e in range(6):
    # rows = env_id % 4 + 1, filled with env_id (the reference dummy
    # fills with env_id too)
    assert dyn[e].shape == (e % 4 + 1, 10)
    np.testing.assert_array_equal(dyn[e], e)
  # static fields are unaffected
  assert out["obs:raw"].shape == (6, 2)


def test_container_through_dialect_step() -> None:
  env = envpool_tpu.make_gymnasium("Dummy-v0", num_envs=3, container_obs=True)
  obs, info = env.reset()
  obs, rew, term, trunc, info = env.step(np.zeros(3, np.int32))
  assert obs["dyn"].dtype == object
  assert obs["dyn"][2].shape == (3, 10)


def test_container_async_cohorts() -> None:
  """Masked/async path gathers the padded pair per cohort correctly."""
  env = envpool_tpu.make_gymnasium(
    "Dummy-v0", num_envs=6, batch_size=3, container_obs=True, state_num=50
  )
  env.async_reset()
  seen = {}
  for _ in range(4):
    out = dict(zip(env.spec._state_keys, env._recv()))
    ids = np.asarray(out["info:env_id"])
    for pos, e in enumerate(ids):
      assert out["obs:dyn"][pos].shape == (int(e) % 4 + 1, 50)
      np.testing.assert_array_equal(out["obs:dyn"][pos], int(e))
      seen[int(e)] = seen.get(int(e), 0) + 1
    env._send([ids.astype(np.int32), ids.astype(np.int32),
               np.zeros(3, np.int32)])
  assert len(seen) == 6


def test_container_gates() -> None:
  # xla() rejects containers, same as the reference
  # (py_envpool.h:226-231 "Xla interface does not support container")
  env = envpool_tpu.make_gymnasium("Dummy-v0", num_envs=2, container_obs=True)
  with pytest.raises(RuntimeError):
    env.xla()
  # multiplayer + container is a documented static-shape gate
  with pytest.raises(NotImplementedError):
    envpool_tpu.make_gymnasium(
      "Dummy-v0", num_envs=2, max_num_players=3, container_obs=True
    )
