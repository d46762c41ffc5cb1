"""dm-acme integration (counterpart of the reference's
``examples/acme_examples/ppo_continuous.py``).

Acme consumes single ``dm_env.Environment`` objects; the reference's
helpers slice its batched pool into per-index views
(``acme_examples/helpers.py``). ``BatchedToSingleDmEnv`` below does the
same over an envpool_tpu dm-dialect pool: index i's view steps only env
i through the engine's masked-cohort path, returning scalar TimeSteps.

Requires the optional ``dm-acme`` package:

  python examples/acme_example.py --task CartPole-v1
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import argparse

import numpy as np

import envpool_tpu


class BatchedToSingleDmEnv:
  """One env's dm_env.Environment view over a batched dm-dialect pool."""

  def __init__(self, pool, index: int):
    self.pool = pool
    self.index = np.asarray([index], np.int32)

  def reset(self):
    ts = self.pool.reset(self.index)
    return self._squeeze(ts)

  def step(self, action):
    ts = self.pool.step(
      {"action": np.asarray(action)[None]}, env_id=self.index
    )
    return self._squeeze(ts)

  def observation_spec(self):
    return self.pool.observation_spec()

  def action_spec(self):
    return self.pool.action_spec()

  def reward_spec(self):
    return self.pool.reward_spec()

  def discount_spec(self):
    return self.pool.discount_spec()

  @staticmethod
  def _squeeze(ts):
    import dm_env
    sq = lambda x: np.asarray(x)[0]
    import jax
    return dm_env.TimeStep(
      step_type=dm_env.StepType(int(np.asarray(ts.step_type)[0])),
      reward=float(np.asarray(ts.reward)[0]),
      discount=float(np.asarray(ts.discount)[0]),
      observation=jax.tree_util.tree_map(sq, ts.observation),
    )

  def close(self):
    pass


def main() -> None:
  p = argparse.ArgumentParser()
  p.add_argument("--task", type=str, default="CartPole-v1")
  p.add_argument("--episodes", type=int, default=3)
  args = p.parse_args()

  pool = envpool_tpu.make_dm(args.task, num_envs=4, seed=0)
  env = BatchedToSingleDmEnv(pool, 0)

  try:
    from acme import EnvironmentLoop
    from acme.agents.jax import ppo
  except ImportError as e:
    # acme absent: drive the single-env view directly to show the surface
    print(f"dm-acme is not installed ({e}); driving the adapter "
          "standalone instead.")
    import dm_env
    ts = env.reset()
    assert ts.step_type == dm_env.StepType.FIRST
    total = 0.0
    while not ts.last():
      ts = env.step(np.int32(0))
      total += ts.reward
    print(f"episode return (noop policy): {total}")
    return

  loop = EnvironmentLoop(env, ppo.PPOBuilder(ppo.PPOConfig()))
  loop.run(num_episodes=args.episodes)


if __name__ == "__main__":
  main()
