"""Training-quality smoke test.

Counterpart of the reference's pretrain/quality tier
(``envpool/atari/atari_pretrain_test.py:85-97`` asserts scores with
pretrained weights): no weights are shipped here, so instead PPO must
LEARN CartPole above the random baseline within a small budget — this
exercises rollout, GAE, and the SPMD update end-to-end for correctness,
not just shape-validity.
"""

import jax
import numpy as np

import envpool_tpu
from envpool_tpu.models import MLPActorCritic
from envpool_tpu.parallel import ShardedEnvPool, make_mesh
from envpool_tpu.train import PPOConfig, make_ppo_train_step, ppo_init


def test_ppo_learns_cartpole() -> None:
  mesh = make_mesh()
  spec = envpool_tpu.make_spec("CartPole-v1", num_envs=64, seed=0)
  pool = ShardedEnvPool(spec, mesh=mesh)
  net = MLPActorCritic(num_actions=2, hidden=(64, 64))
  cfg = PPOConfig(
    num_steps=64, update_epochs=4, num_minibatches=4, lr=3e-4,
    ent_coef=0.01,
  )
  state, tx = ppo_init(pool, net, cfg, seed=0)
  step = jax.jit(make_ppo_train_step(pool, net, cfg, tx, mesh=mesh))

  rewards = []
  for it in range(30):
    state, metrics = step(state)
    rewards.append(float(metrics["mean_reward"]))
  # CartPole reward is 1 per alive step and 0 on the auto-reset step, so
  # mean reward/step == 1 - episode_termination_rate. The untrained policy
  # dies every ~20 steps (~0.95); learning must push the death rate down
  # (the entropy bonus keeps some exploration, so compare the best
  # post-warmup window against the start).
  best = float(np.max(rewards[5:]))
  assert best > rewards[0], rewards
  assert best > 0.985, rewards


def test_ppo_learns_inverted_pendulum_continuous() -> None:
  """Gaussian-policy PPO on the on-device MuJoCo tier: survival must
  improve over the untrained policy (continuous-control counterpart of
  the CartPole check; exercises the device physics engine end-to-end
  inside the training program)."""
  from envpool_tpu.models import GaussianMLPActorCritic

  mesh = make_mesh()
  spec = envpool_tpu.make_spec("InvertedPendulumJax-v4", num_envs=64,
                               seed=0)
  pool = ShardedEnvPool(spec, mesh=mesh)
  net = GaussianMLPActorCritic(action_dim=1, hidden=(64, 64))
  cfg = PPOConfig(
    continuous=True, num_steps=64, update_epochs=4, num_minibatches=4,
    lr=3e-4, ent_coef=0.0,
  )
  state, tx = ppo_init(pool, net, cfg, seed=0)
  step = jax.jit(make_ppo_train_step(pool, net, cfg, tx, mesh=mesh))

  rewards = []
  for it in range(25):
    state, metrics = step(state)
    rewards.append(float(metrics["mean_reward"]))
  best = float(np.max(rewards[5:]))
  assert best > rewards[0], rewards
  assert best > 0.97, rewards


def test_ppo_learns_sokoban() -> None:
  """Image-obs learning-quality check on the flagship family — the
  stand-in for the reference's pretrain score tier
  (``atari_pretrain_test.py:85-97``): PPO over the SokobanCNN must push
  mean reward above the random policy's within a small budget.

  Runs in a plain-python child process: the XLA CPU compile of this
  train step takes ~6 s standalone but >10 minutes inside a pytest
  process with identical flags/config (jaxlib/pytest interaction; the
  _isolation tier works around a sibling symptom)."""
  import os
  import subprocess
  import sys

  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  flags = env.get("XLA_FLAGS", "")
  if "xla_force_host_platform_device_count" not in flags:
    env["XLA_FLAGS"] = (
      flags + " --xla_force_host_platform_device_count=8"
    ).strip()
  child = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "_sokoban_learn_child.py"
  )
  proc = subprocess.run(
    [sys.executable, child],
    env=env, capture_output=True, text=True, timeout=1500,
    cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
  )
  assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-1000:]
