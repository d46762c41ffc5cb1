"""PPO on Sokoban, fully on-device (counterpart of ``examples/ppo_atari``).

The reference example trains torch PPO against the C++ pool through numpy;
here the rollout + GAE + update is ONE jitted SPMD program per iteration
(envs data-parallel over the mesh, gradients all-reduced by XLA).

Run:  python examples/ppo_sokoban.py --num-envs 1024 --iterations 50
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import argparse
import time

import jax

import envpool_tpu
from envpool_tpu.models import SokobanCNN
from envpool_tpu.parallel import ShardedEnvPool, make_mesh
from envpool_tpu.train import PPOConfig, make_ppo_train_step, ppo_init


def main() -> None:
  p = argparse.ArgumentParser()
  p.add_argument("--num-envs", type=int, default=1024)
  p.add_argument("--iterations", type=int, default=50)
  p.add_argument("--num-steps", type=int, default=32)
  p.add_argument("--lr", type=float, default=2.5e-4)
  p.add_argument("--seed", type=int, default=0)
  args = p.parse_args()

  mesh = make_mesh()
  spec = envpool_tpu.make_spec(
    "Sokoban-v0", num_envs=args.num_envs, seed=args.seed,
    max_episode_steps=60, levels_dir="", n_levels_to_load=1024,
  )
  pool = ShardedEnvPool(spec, mesh=mesh)
  net = SokobanCNN()
  cfg = PPOConfig(num_steps=args.num_steps, lr=args.lr)
  state, tx = ppo_init(pool, net, cfg, seed=args.seed)
  train_step = jax.jit(make_ppo_train_step(pool, net, cfg, tx, mesh=mesh))

  steps_per_iter = args.num_envs * args.num_steps
  for it in range(args.iterations):
    t0 = time.perf_counter()
    state, metrics = train_step(state)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    print(
      f"iter {it:4d}  reward/step {float(metrics['mean_reward']):+.4f}  "
      f"pg {float(metrics['pg_loss']):+.4f}  "
      f"v {float(metrics['v_loss']):.4f}  "
      f"ent {float(metrics['entropy']):.3f}  "
      f"sps {steps_per_iter / dt:,.0f}"
    )


if __name__ == "__main__":
  main()
