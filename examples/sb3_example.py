"""Stable-Baselines3 integration (counterpart of the reference's
``examples/sb3_examples``): wrap the batched pool as an SB3 VecEnv.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np

import envpool_tpu


class EnvPoolVecAdapter:
  """Minimal SB3 VecEnv adapter over a gymnasium-dialect pool."""

  def __init__(self, env):
    self.env = env
    self.num_envs = len(env)
    self.observation_space = env.observation_space
    self.action_space = env.action_space
    self._actions = None

  def reset(self):
    obs, _ = self.env.reset()
    return obs

  def step_async(self, actions):
    self._actions = actions

  def step_wait(self):
    obs, rew, term, trunc, info = self.env.step(np.asarray(self._actions))
    done = term | trunc
    infos = [
      {k: v[i] for k, v in info.items()} for i in range(self.num_envs)
    ]
    return obs, rew, done, infos

  def close(self):
    pass


def main() -> None:
  env = EnvPoolVecAdapter(
    envpool_tpu.make_gymnasium("CartPole-v1", num_envs=16, seed=0)
  )
  obs = env.reset()
  for _ in range(100):
    env.step_async(np.random.randint(0, 2, env.num_envs))
    obs, rew, done, infos = env.step_wait()
  print("adapter round-trip OK;", obs.shape)
  # with sb3 installed:
  #   from stable_baselines3 import PPO
  #   model = PPO("MlpPolicy", env); model.learn(100_000)


if __name__ == "__main__":
  main()
