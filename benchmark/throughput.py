"""Throughput benchmark harness (port of ``benchmark/test_envpool.py``).

Measures env-steps/s (FPS) for any registered task in three modes:
- sync:   full-batch step() loop through the host API;
- async:  send/recv with batch_size < num_envs (host API);
- xla:    fully-compiled on-device scan (the TPU-native hot path — no
          reference equivalent; its XLA mode still crossed the host,
          ``envpool/core/xla.h:132-209``).

Example:
  python -m benchmark.throughput --task Sokoban-v0 --num-envs 4096 \
      --total-step 256 --mode xla -- --levels_dir "" --n_levels_to_load 512
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Any, Dict

import numpy as np


def _random_actions(env, num: int, rng: np.random.Generator):
  spec = env.spec.action_array_spec["action"]
  if np.issubdtype(spec.dtype, np.integer):
    lo = int(spec.minimum) if np.ndim(spec.minimum) == 0 else 0
    hi = int(spec.maximum) if np.ndim(spec.maximum) == 0 else 1
    return rng.integers(lo, hi + 1, (num, *spec.static_shape)).astype(
      spec.dtype
    )
  return rng.uniform(-1, 1, (num, *spec.static_shape)).astype(spec.dtype)


def bench_sync(env, total_step: int, num_envs: int) -> float:
  rng = np.random.default_rng(0)
  env.reset()
  env.step(_random_actions(env, num_envs, rng))  # warmup/compile
  t0 = time.perf_counter()
  for _ in range(total_step):
    env.step(_random_actions(env, num_envs, rng))
  dt = time.perf_counter() - t0
  return total_step * num_envs / dt


def bench_async(env, total_step: int, batch_size: int) -> float:
  rng = np.random.default_rng(0)
  env.async_reset()
  obs = env.recv()
  info = obs[-1]
  env.send(_random_actions(env, batch_size, rng), env_id=info["env_id"])
  t0 = time.perf_counter()
  for _ in range(total_step):
    *_, info = env.recv()
    env.send(_random_actions(env, batch_size, rng), env_id=info["env_id"])
  dt = time.perf_counter() - t0
  return total_step * batch_size / dt


def bench_xla(env, total_step: int, num_envs: int) -> float:
  import jax
  import jax.numpy as jnp

  env.reset()
  handle0, recv, send, _ = env.xla()
  spec = env.spec.action_array_spec["action"]
  discrete = np.issubdtype(spec.dtype, np.integer)
  lo = int(spec.minimum) if np.ndim(spec.minimum) == 0 else 0
  hi = int(spec.maximum) if np.ndim(spec.maximum) == 0 else 1

  def rollout(handle, key):
    def body(carry, _):
      handle, key = carry
      key, sub = jax.random.split(key)
      if discrete:
        act = jax.random.randint(sub, (num_envs,), lo, hi + 1, jnp.int32)
      else:
        act = jax.random.uniform(
          sub, (num_envs, *spec.static_shape), jnp.float32, -1, 1
        )
      handle = send(handle, act)
      _, states = recv(handle)
      return (handle, key), states[0].sum()

    (handle, key), acc = jax.lax.scan(
      body, (handle, key), None, length=total_step
    )
    return handle, acc.sum()

  run = jax.jit(rollout, donate_argnums=0)
  handle, acc = run(handle0, jax.random.PRNGKey(0))
  jax.block_until_ready(acc)
  t0 = time.perf_counter()
  handle, acc = run(handle, jax.random.PRNGKey(1))
  jax.block_until_ready(acc)
  dt = time.perf_counter() - t0
  return total_step * num_envs / dt


def main() -> None:
  p = argparse.ArgumentParser()
  p.add_argument("--task", type=str, default="CartPole-v1")
  p.add_argument("--num-envs", type=int, default=4096)
  p.add_argument("--batch-size", type=int, default=0)
  p.add_argument("--total-step", type=int, default=256)
  p.add_argument("--mode", choices=["sync", "async", "xla"], default="sync")
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("env_kwargs", nargs="*", help="k=v extra make() kwargs")
  args = p.parse_args()

  import envpool_tpu

  kwargs: Dict[str, Any] = {}
  for kv in args.env_kwargs:
    k, v = kv.split("=", 1)
    try:
      v = json.loads(v)
    except json.JSONDecodeError:
      pass
    kwargs[k] = v
  batch = args.batch_size or args.num_envs
  env = envpool_tpu.make_gymnasium(
    args.task, num_envs=args.num_envs, batch_size=batch,
    seed=args.seed, **kwargs,
  )
  if args.mode == "sync":
    fps = bench_sync(env, args.total_step, args.num_envs)
  elif args.mode == "async":
    fps = bench_async(env, args.total_step, batch)
  else:
    fps = bench_xla(env, args.total_step, args.num_envs)
  print(json.dumps({
    "task": args.task, "mode": args.mode, "num_envs": args.num_envs,
    "batch_size": batch, "fps": round(fps, 1),
  }))


if __name__ == "__main__":
  main()
