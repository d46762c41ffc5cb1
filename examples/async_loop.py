"""Async send/recv loop (counterpart of the reference's async examples).

recv returns the first batch_size finishers; send re-queues exactly those
env ids (``envpool/python/envpool.py:122-133`` contract).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


import numpy as np

import envpool_tpu


def main() -> None:
  num_envs, batch_size = 64, 16
  env = envpool_tpu.make_gymnasium(
    "Ant-v4", num_envs=num_envs, batch_size=batch_size, num_threads=8,
    seed=0,
  )
  env.async_reset()
  returns = np.zeros(num_envs)
  for it in range(500):
    obs, rew, term, trunc, info = env.recv()
    ids = info["env_id"]
    returns[ids] += rew
    action = np.random.uniform(-1, 1, (batch_size, 8))
    env.send(action, env_id=ids)
  print("mean return so far:", returns.mean())


if __name__ == "__main__":
  main()
