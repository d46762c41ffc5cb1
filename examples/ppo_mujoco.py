"""PPO on on-device MuJoCo (continuous control), fully on-device.

Counterpart of the reference's mujoco training integrations (cleanrl /
sb3 examples over the C++ pool): here the physics engine, the rollout,
GAE and the Gaussian-policy PPO update all run inside ONE jitted SPMD
program per iteration — no host round trips, envs data-parallel over the
mesh.

Run:  python examples/ppo_mujoco.py --task HalfCheetahJax-v4 \
          --num-envs 2048 --iterations 100
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse
import time

import jax

import envpool_tpu
from envpool_tpu.models import GaussianMLPActorCritic
from envpool_tpu.parallel import ShardedEnvPool, make_mesh
from envpool_tpu.train import PPOConfig, make_ppo_train_step, ppo_init


def main() -> None:
  p = argparse.ArgumentParser()
  p.add_argument("--task", type=str, default="HalfCheetahJax-v4")
  p.add_argument("--num-envs", type=int, default=2048)
  p.add_argument("--iterations", type=int, default=100)
  p.add_argument("--num-steps", type=int, default=32)
  p.add_argument("--lr", type=float, default=3e-4)
  p.add_argument("--seed", type=int, default=0)
  args = p.parse_args()

  mesh = make_mesh()
  pool = ShardedEnvPool(
    envpool_tpu.make_spec(
      args.task, num_envs=args.num_envs, seed=args.seed
    ),
    mesh=mesh,
  )

  act_spec = pool.spec.action_array_spec["action"]
  net = GaussianMLPActorCritic(action_dim=int(act_spec.static_shape[-1]))
  cfg = PPOConfig(
    num_steps=args.num_steps, lr=args.lr, continuous=True,
    ent_coef=0.0, update_epochs=4, num_minibatches=8,
  )
  state, tx = ppo_init(pool, net, cfg, seed=args.seed)
  train_step = jax.jit(
    make_ppo_train_step(pool, net, cfg, tx, mesh=mesh)
  )

  steps_per_iter = args.num_envs * args.num_steps
  for it in range(args.iterations):
    t0 = time.time()
    state, metrics = train_step(state)
    jax.block_until_ready(metrics["mean_reward"])
    dt = time.time() - t0
    print(
      f"iter {it:4d}  reward {float(metrics['mean_reward']):+.4f}  "
      f"pg {float(metrics['pg_loss']):+.4f}  "
      f"v {float(metrics['v_loss']):.4f}  "
      f"{steps_per_iter / dt:,.0f} env-steps/s"
    )


if __name__ == "__main__":
  main()
