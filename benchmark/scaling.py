"""Mesh scaling-efficiency harness.

Measures env-steps/s at mesh sizes 1, 2, 4, ..., N and reports the
scaling efficiency  fps(N) / (N * fps(1))  — the BASELINE.json north-star
metric (1 chip -> 1 host -> N hosts; the reference's counterpart was one
pool per NUMA node, `benchmark/numa_test.sh`).

On real hardware run it on the full slice; without hardware set
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
to validate the sharding path on virtual devices (the absolute numbers
are then meaningless, the efficiency trend is not).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_mesh(task: str, num_envs: int, steps: int, n_devices: int,
               **kwargs) -> float:
  import envpool_tpu
  from envpool_tpu.parallel import ShardedEnvPool, make_mesh

  mesh = make_mesh(n_devices=n_devices)
  spec = envpool_tpu.make_spec(task, num_envs=num_envs, seed=0, **kwargs)
  pool = ShardedEnvPool(spec, mesh=mesh)
  pool._reset(np.arange(num_envs, dtype=np.int32))
  pool._recv()
  handle0, recv, send, _ = pool.xla()
  act_spec = pool.spec.action_array_spec["action"]
  discrete = np.issubdtype(act_spec.dtype, np.integer)
  lo = int(act_spec.minimum) if np.ndim(act_spec.minimum) == 0 else 0
  hi = int(act_spec.maximum) if np.ndim(act_spec.maximum) == 0 else 1

  def rollout(handle, key):
    def body(carry, _):
      handle, key = carry
      key, sub = jax.random.split(key)
      if discrete:
        act = jax.random.randint(sub, (num_envs,), lo, hi + 1, jnp.int32)
      else:
        act = jax.random.uniform(
          sub, (num_envs, *act_spec.static_shape), jnp.float32, -1, 1
        )
      handle = send(handle, act)
      _, states = recv(handle)
      return (handle, key), states[0].sum()

    (handle, key), acc = jax.lax.scan(body, (handle, key), None,
                                      length=steps)
    return handle, acc.sum()

  run = jax.jit(rollout, donate_argnums=0)
  handle, acc = run(handle0, jax.random.PRNGKey(0))
  jax.block_until_ready(acc)
  t0 = time.perf_counter()
  handle, acc = run(handle, jax.random.PRNGKey(1))
  jax.block_until_ready(acc)
  return num_envs * steps / (time.perf_counter() - t0)


def main() -> None:
  p = argparse.ArgumentParser()
  p.add_argument("--task", default="CartPole-v1")
  p.add_argument("--num-envs", type=int, default=4096)
  p.add_argument("--steps", type=int, default=256)
  args = p.parse_args()

  n_max = len(jax.devices())
  sizes = []
  n = 1
  while n <= n_max:
    sizes.append(n)
    n *= 2
  results = {}
  for n in sizes:
    fps = bench_mesh(args.task, args.num_envs, args.steps, n)
    results[n] = fps
  base = results[sizes[0]]
  report = {
    "task": args.task,
    "num_envs": args.num_envs,
    "fps": {str(k): round(v, 1) for k, v in results.items()},
    "scaling_efficiency": {
      str(k): round(v / (k * base), 3) for k, v in results.items()
    },
    "platform": jax.devices()[0].platform,
  }
  print(json.dumps(report))


if __name__ == "__main__":
  main()
