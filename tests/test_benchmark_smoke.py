"""Benchmarks-as-tests (cf. ``benchmark/test_envpool.py`` run in CI)."""


import envpool_tpu
from benchmark.throughput import bench_sync, bench_xla


def test_throughput_sync_smoke() -> None:
  env = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=256, seed=0)
  fps = bench_sync(env, total_step=20, num_envs=256)
  assert fps > 0


def test_throughput_xla_smoke() -> None:
  env = envpool_tpu.make_gymnasium("CartPole-v1", num_envs=256, seed=0)
  fps = bench_xla(env, total_step=50, num_envs=256)
  # the compiled path must beat the eager path by a wide margin
  assert fps > 10_000
