"""Engine behavioral tests: auto-reset, truncation, partial batches, async
cohorts, in-jit xla loop + eager/xla equality.

Mirrors the reference engine tests
(``envpool/atari/atari_envpool_test.py:90-219``).
"""

import jax
import jax.numpy as jnp
import numpy as np

import envpool_tpu


def test_auto_reset_and_truncation() -> None:
  """A done env's next step is FIRST with elapsed 0 / reward 0."""
  num_envs = 4
  max_steps = 10
  env = envpool_tpu.make_gymnasium(
    "CartPole-v1", num_envs=num_envs, seed=0, max_episode_steps=max_steps
  )
  env.reset()
  seen_done = False
  prev_done = np.zeros(num_envs, np.bool_)
  for t in range(3 * max_steps):
    obs, rew, term, trunc, info = env.step(
      np.random.randint(0, 2, num_envs)
    )
    done = term | trunc
    # envs that were done last step must have auto-reset now
    if prev_done.any():
      seen_done = True
      np.testing.assert_array_equal(info["elapsed_step"][prev_done], 0)
      np.testing.assert_array_equal(rew[prev_done], 0.0)
      np.testing.assert_array_equal(done[prev_done], False)
    # elapsed never exceeds the cap; done set at the cap
    assert (info["elapsed_step"] <= max_steps).all()
    at_cap = info["elapsed_step"] == max_steps
    np.testing.assert_array_equal(trunc[at_cap], True)
    prev_done = done
  assert seen_done


def test_dm_step_type_cycle() -> None:
  env = envpool_tpu.make_dm(
    "CartPole-v1", num_envs=2, seed=0, max_episode_steps=3
  )
  ts = env.reset()
  np.testing.assert_array_equal(ts.step_type, 0)
  types = []
  for _ in range(4):
    ts = env.step(np.zeros(2, np.int32))
    types.append(np.asarray(ts.step_type).copy())
  # elapsed: 1(MID) 2(MID) 3(LAST,cap) 0(FIRST after auto-reset)
  np.testing.assert_array_equal(types[0], 1)
  np.testing.assert_array_equal(types[1], 1)
  np.testing.assert_array_equal(types[2], 2)
  np.testing.assert_array_equal(types[3], 0)
  ts = env.step(np.zeros(2, np.int32))
  np.testing.assert_array_equal(ts.step_type, 1)
  np.testing.assert_array_equal(np.asarray(ts.discount), 1.0)


def test_partial_batch_sync() -> None:
  """Sending a subset of env_id steps only those envs."""
  num_envs = 8
  env = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=num_envs, seed=0)
  env.reset()
  env.step(np.zeros(num_envs, np.int32))
  sub = np.array([1, 3, 5], np.int32)
  obs, rew, term, trunc, info = env.step(np.zeros(3, np.int32), env_id=sub)
  assert obs.shape == (3, 4)
  np.testing.assert_array_equal(info["env_id"], sub)
  np.testing.assert_array_equal(info["elapsed_step"], 2)
  # other envs did not advance
  rest = np.array([0, 2, 4, 6, 7], np.int32)
  obs, rew, term, trunc, info = env.step(
    np.zeros(5, np.int32), env_id=rest
  )
  np.testing.assert_array_equal(info["env_id"], rest)
  np.testing.assert_array_equal(info["elapsed_step"], 2)


def test_async_cohorts() -> None:
  """async mode: recv cohorts, send exactly those env_ids back."""
  num_envs = 8
  batch = 4
  env = envpool_tpu.make_gymnasium(
    "CartPole-v1", num_envs=num_envs, batch_size=batch, seed=0
  )
  assert env.is_async
  env.async_reset()
  stepped = {i: 0 for i in range(num_envs)}
  for it in range(20):
    obs, rew, term, trunc, info = env.recv()
    env_id = info["env_id"]
    assert len(env_id) == batch
    for i in env_id:
      stepped[int(i)] += 1
    env.send(np.zeros(batch, np.int32), env_id=env_id)
  # every env participated equally (round-robin cohorts)
  counts = np.array(list(stepped.values()))
  assert counts.sum() == 20 * batch
  assert counts.max() - counts.min() <= 1


def test_interleaved_env_id_sets() -> None:
  """Mirrors the reference partial-step test with interleaved id sets
  (``envpool/atari/atari_envpool_test.py:138-164``)."""
  num_envs = 6
  env = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=num_envs, seed=0)
  env.reset()
  a = np.array([0, 1, 2], np.int32)
  b = np.array([3, 4, 5], np.int32)
  env.send(np.zeros(3, np.int32), env_id=a)
  env.send(np.ones(3, np.int32), env_id=b)
  _, _, _, _, info1 = env.recv()
  _, _, _, _, info2 = env.recv()
  np.testing.assert_array_equal(info1["env_id"], a)
  np.testing.assert_array_equal(info2["env_id"], b)


def test_xla_jit_loop() -> None:
  """Pure in-jit rollout via env.xla(), and eager/xla bit-equality.

  Mirrors ``envpool/atari/atari_envpool_test.py:166-219`` — but here the
  whole loop compiles to one on-device XLA program.
  """
  num_envs = 5
  env = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=num_envs, seed=7)
  env.reset()
  handle, recv, send, step = env.xla()

  def actor_step(_, handle):
    handle, states = recv(handle)
    action = jnp.zeros(num_envs, jnp.int32)
    handle = send(handle, action)
    return handle

  @jax.jit
  def run(handle):
    return jax.lax.fori_loop(0, 100, actor_step, handle)

  out_handle = run(handle)
  _, states = recv(out_handle)
  obs_xla = np.asarray(states[8])  # "obs" is state key index 8

  # eager comparison from an identical fresh pool
  env2 = envpool_tpu.make_gymnasium(
    "CartPole-v1", num_envs=num_envs, seed=7
  )
  env2.reset()
  for _ in range(100):
    obs_eager, *_ = env2.step(np.zeros(num_envs, np.int32))
  np.testing.assert_allclose(obs_xla, obs_eager, rtol=1e-6)


def test_xla_commit_folds_rollout_into_host_pool() -> None:
  """commit(handle): host API continues from the in-jit rollout's state.

  (Documented divergence from the reference, where xla send/recv mutate
  the same pool the host API sees; see TpuEnvPool.xla().)
  """
  num_envs = 4
  env = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=num_envs, seed=3)
  env.reset()
  handle, recv, send, step = env.xla()

  @jax.jit
  def run(handle):
    return jax.lax.fori_loop(
      0, 10,
      lambda _, h: send(h, jnp.zeros(num_envs, jnp.int32)),
      handle,
    )

  out_handle = run(handle)
  env.commit(out_handle)
  obs_a, _, _, _, info = env.step(np.zeros(num_envs, np.int32))

  # eager twin: same seed, 10 host-API steps, then the same 11th step
  env2 = envpool_tpu.make_gymnasium(
    "CartPole-v1", num_envs=num_envs, seed=3
  )
  env2.reset()
  for _ in range(10):
    env2.step(np.zeros(num_envs, np.int32))
  obs_b, *_ = env2.step(np.zeros(num_envs, np.int32))
  np.testing.assert_allclose(obs_a, obs_b, rtol=1e-6)


def test_checkpoint_restore() -> None:
  """Pool state is a pytree: save/restore reproduces the trajectory."""
  env = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=4, seed=0)
  env.reset()
  for _ in range(5):
    env.step(np.zeros(4, np.int32))
  snap = env.save_state()
  obs_a, *_ = env.step(np.zeros(4, np.int32))
  env.load_state(snap)
  obs_b, *_ = env.step(np.zeros(4, np.int32))
  np.testing.assert_array_equal(obs_a, obs_b)
