"""Tianshou integration (counterpart of the reference's
``examples/tianshou_examples/cartpole_ppo.py``).

Tianshou >= 0.4.5 ships native envpool support: its ``BaseVectorEnv``
protocol is exactly the batched gymnasium dialect — ``reset`` /
``step(actions, ids)`` over env-id subsets. The adapter below maps that
protocol onto an envpool_tpu pool (partial ``env_id`` stepping uses the
engine's masked-cohort path), so tianshou trainers run unchanged.

Requires the optional ``tianshou`` package:

  python examples/tianshou_example.py --task CartPole-v1
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import numpy as np

import envpool_tpu


class TianshouVectorEnvAdapter:
  """envpool_tpu pool -> tianshou ``BaseVectorEnv`` duck type."""

  def __init__(self, env):
    self.env = env
    self.env_num = len(env)
    self.observation_space = env.observation_space
    self.action_space = env.action_space
    self.is_async = False

  def __len__(self):
    return self.env_num

  def reset(self, id=None, **kwargs):
    if id is None:
      return self.env.reset()
    ts = self.env.reset(np.asarray(id, np.int32))
    return ts

  def step(self, action, id=None):
    if id is None:
      return self.env.step(np.asarray(action))
    return self.env.step(
      np.asarray(action), env_id=np.asarray(id, np.int32)
    )

  def close(self):
    pass


def main() -> None:
  p = argparse.ArgumentParser()
  p.add_argument("--task", type=str, default="CartPole-v1")
  p.add_argument("--num-envs", type=int, default=10)
  p.add_argument("--epochs", type=int, default=3)
  args = p.parse_args()

  try:
    import torch
    from tianshou.data import Collector, VectorReplayBuffer
    from tianshou.policy import PPOPolicy
    from tianshou.trainer import OnpolicyTrainer
    from tianshou.utils.net.common import ActorCritic, Net
    from tianshou.utils.net.discrete import Actor, Critic
  except ImportError as e:
    print(f"tianshou is not installed ({e}); the adapter above is the "
          "integration surface — `pip install tianshou` to run this "
          "example end-to-end.")
    return

  envs = TianshouVectorEnvAdapter(envpool_tpu.make_gymnasium(
    args.task, num_envs=args.num_envs, seed=0
  ))
  obs_shape = envs.observation_space.shape
  act_n = envs.action_space.n
  net = Net(obs_shape, hidden_sizes=[64, 64])
  actor = Actor(net, act_n)
  critic = Critic(Net(obs_shape, hidden_sizes=[64, 64]))
  optim = torch.optim.Adam(
    ActorCritic(actor, critic).parameters(), lr=3e-4
  )
  policy = PPOPolicy(
    actor=actor, critic=critic, optim=optim,
    dist_fn=torch.distributions.Categorical,
    action_space=envs.action_space,
  )
  collector = Collector(
    policy, envs, VectorReplayBuffer(20000, args.num_envs)
  )
  result = OnpolicyTrainer(
    policy=policy, train_collector=collector, max_epoch=args.epochs,
    step_per_epoch=10000, repeat_per_collect=4, episode_per_test=0,
    batch_size=256, step_per_collect=2000,
  ).run()
  print(result)


if __name__ == "__main__":
  main()
