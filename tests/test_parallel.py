"""Mesh-sharding + trainer tests on the virtual 8-device CPU mesh.

This layer has no reference counterpart (envpool is single-process,
SURVEY §1); the contract tested: sharded execution is bit-identical to
single-device execution, the env axis is actually partitioned over the
mesh, and the full PPO train step compiles and runs SPMD.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import envpool_tpu
from envpool_tpu.models import MLPActorCritic
from envpool_tpu.parallel import ShardedEnvPool, make_mesh
from envpool_tpu.train import PPOConfig, make_ppo_train_step, ppo_init


def test_mesh_has_8_devices() -> None:
  assert len(jax.devices()) == 8


def test_sharded_matches_unsharded() -> None:
  spec = envpool_tpu.make_spec("CartPole-v1", num_envs=64, seed=5)
  plain = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=64, seed=5)
  mesh = make_mesh()
  sharded = ShardedEnvPool(spec, mesh=mesh)  # raw engine; low-level protocol
  o1, _ = plain.reset()
  sharded._reset(np.arange(64, dtype=np.int32))
  s_out = sharded._recv()
  obs_idx = spec._state_keys.index("obs")
  np.testing.assert_allclose(o1, s_out[obs_idx], rtol=0, atol=0)
  for t in range(20):
    act = np.tile(np.asarray([t % 2], np.int32), 64)
    o1, r1, te1, tr1, _ = plain.step(act)
    alist = [np.arange(64, dtype=np.int32), np.arange(64, dtype=np.int32),
             act]
    sharded._send(alist)
    s_out = sharded._recv()
    np.testing.assert_array_equal(o1, s_out[obs_idx])
    np.testing.assert_array_equal(r1, s_out[spec._state_keys.index("reward")])


def test_state_is_partitioned() -> None:
  mesh = make_mesh()
  spec = envpool_tpu.make_spec("CartPole-v1", num_envs=64, seed=0)
  pool = ShardedEnvPool(spec, mesh=mesh)
  sharding = pool._state.elapsed.sharding
  # the env axis must be split over all 8 devices
  assert len(sharding.device_set) == 8


def test_num_envs_not_divisible_raises() -> None:
  mesh = make_mesh()
  spec = envpool_tpu.make_spec("CartPole-v1", num_envs=63)
  with pytest.raises(ValueError):
    ShardedEnvPool(spec, mesh=mesh)


def test_ppo_train_step_spmd() -> None:
  mesh = make_mesh()
  spec = envpool_tpu.make_spec("CartPole-v1", num_envs=32, seed=0)
  pool = ShardedEnvPool(spec, mesh=mesh)
  net = MLPActorCritic(num_actions=2, hidden=(32,))
  cfg = PPOConfig(num_steps=4, update_epochs=1, num_minibatches=2)
  state, tx = ppo_init(pool, net, cfg, seed=0)
  step = jax.jit(make_ppo_train_step(pool, net, cfg, tx, mesh=mesh))
  state, metrics = step(state)
  state, metrics = step(state)
  assert np.isfinite(float(metrics["pg_loss"]))
  assert np.isfinite(float(metrics["mean_reward"]))


def test_rollout_on_device() -> None:
  mesh = make_mesh()
  spec = envpool_tpu.make_spec("CartPole-v1", num_envs=16, seed=1)
  pool = ShardedEnvPool(spec, mesh=mesh)

  def policy(pstate, states):
    return pstate, jnp.zeros(16, jnp.int32)

  (handle, _), traj = pool.rollout(policy, None, num_steps=10)
  rew_idx = spec._state_keys.index("reward")
  assert traj[rew_idx].shape == (10, 16)
