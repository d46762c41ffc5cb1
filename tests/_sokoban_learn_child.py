"""Child process for test_ppo_learns_sokoban (executed with plain
``python``, not pytest): the XLA CPU compile of the Sokoban train step
takes seconds standalone but >10 minutes inside a pytest process (same
flags, same config — a jaxlib/pytest interaction this repo works around
the same way tests/_isolation.py works around the in-process compile
crash). Exits 0 iff the windowed mean reward improves."""

import sys

sys.path.insert(0, ".")

import jax  # noqa: E402
import numpy as np  # noqa: E402

import envpool_tpu  # noqa: E402
from envpool_tpu.models import SokobanCNN  # noqa: E402
from envpool_tpu.parallel import ShardedEnvPool, make_mesh  # noqa: E402
from envpool_tpu.train import (  # noqa: E402
  PPOConfig, make_ppo_train_step, ppo_init,
)


def main() -> int:
  mesh = make_mesh()
  spec = envpool_tpu.make_spec(
    "Sokoban-v0", num_envs=32, seed=0, dim_room=7,
    max_episode_steps=32, levels_dir="", n_levels_to_load=32,
  )
  pool = ShardedEnvPool(spec, mesh=mesh)
  net = SokobanCNN(num_actions=4)
  cfg = PPOConfig(
    num_steps=32, update_epochs=4, num_minibatches=4, lr=7e-4,
    ent_coef=0.01,
  )
  state, tx = ppo_init(pool, net, cfg, seed=0)
  step = jax.jit(make_ppo_train_step(pool, net, cfg, tx, mesh=mesh))
  rewards = []
  for _ in range(40):
    state, metrics = step(state)
    rewards.append(float(metrics["mean_reward"]))
  # windowed trend beats single-sample noise: mean reward is the -0.1
  # step penalty plus box-push/finish bonuses, so a rising window mean
  # == the policy pushing more boxes onto targets than random
  # (measured: first8 -0.0705 -> last8 -0.0598 at this budget)
  first = float(np.mean(rewards[:8]))
  last = float(np.mean(rewards[-8:]))
  print("rewards:", [round(r, 4) for r in rewards])
  if last > first + 0.005:
    print(f"PASS first8={first:.4f} last8={last:.4f}")
    return 0
  print(f"FAIL first8={first:.4f} last8={last:.4f}")
  return 1


if __name__ == "__main__":
  sys.exit(main())
